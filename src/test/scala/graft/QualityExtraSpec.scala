package graft

import org.apache.spark.sql.functions._

import graft.operators.{Association, Evaluation, Expectations, Merge}
import graft.plans.PlanFacts

/** Quarantine routing, A/B z-test, basket lift, CDC delta extraction,
  * and PlanFacts introspection.
  */
class QualityExtraSpec extends SparkSpec {
  import spark.implicits._

  test("quarantine: rows route by rule; null predicate counts as failure") {
    val df = Seq(
      (1L, 10.0, "ok"),
      (2L, -5.0, "ok"),            // fails range
      (3L, 10.0, null),            // null type -> rule can't pass
      (4L, 200.0, "bad"))          // fails both
      .toDF("id", "v", "t")
    val rules = Seq(
      "range" -> ($"v" >= 0 && $"v" <= 100),
      "type" -> ($"t" === "ok"))
    val (valid, rejects) = Expectations.quarantine(df, rules)
    assert(valid.select("id").as[Long].collect().sorted.toSeq === Seq(1L))
    val rej = rejects.select($"id", $"reject_reasons")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rej === Map(
      2L -> Seq("range"), 3L -> Seq("type"), 4L -> Seq("range", "type")))
    val report = Expectations.quarantineReport(df, rules)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report === Map("range" -> 2L, "type" -> 2L, "__clean__" -> 1L))
  }

  test("abTest: hand-computed two-proportion z; degenerate variance gives null z") {
    // control 4 units 1 conv; treat 4 units 3 conv
    val df = (Seq.fill(1)((0, 1)) ++ Seq.fill(3)((0, 0)) ++
      Seq.fill(3)((1, 1)) ++ Seq.fill(1)((1, 0))).toDF("grp", "conv")
    val r = Evaluation.abTest(df, "grp", "conv").head()
    assert(r.getAs[Long]("n_control") === 4L)
    assert(r.getAs[Double]("uplift") === 0.5)
    val pp = 0.5
    val z = 0.5 / math.sqrt(pp * (1 - pp) * (1.0 / 4 + 1.0 / 4))
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-12)
    // all convert -> zero pooled variance -> null z, no ANSI throw
    val degen = Seq((0, 1), (1, 1)).toDF("grp", "conv")
    assert(Evaluation.abTest(degen, "grp", "conv").head().isNullAt(7))
  }

  test("qiniCurve: hand-computed two-tile curve") {
    // 8 units, score = id desc ordering; top tile (ids 8..5):
    //   treat {8,6}: 2 conv; control {7,5}: 0 conv
    // bottom tile (ids 4..1): treat {4,2}: 0 conv; control {3,1}: 1 conv
    val df = Seq(
      (8L, 1, 1), (7L, 0, 0), (6L, 1, 1), (5L, 0, 0),
      (4L, 1, 0), (3L, 0, 1), (2L, 1, 0), (1L, 0, 0))
      .toDF("id", "grp", "conv")
      .withColumn("score", col("id").cast("double"))
    val r = Evaluation.qiniCurve(df, "score", "grp", "conv",
      tieBreak = Seq("id"), tiles = 2).collect()
    assert(r.length === 2)
    val t1 = r(0)
    assert(t1.getAs[Long]("tile") === 1L)
    assert(t1.getAs[Long]("n_treat") === 2L)
    assert(t1.getAs[Long]("conv_treat") === 2L)
    // Q(1) = 2 - 0 * 2/2 = 2; uplift tile 1 = 2/2 - 0/2 = 1
    assert(t1.getAs[Double]("qini") === 2.0)
    assert(t1.getAs[Double]("uplift") === 1.0)
    val t2 = r(1)
    // Q(2) = crt 2 - crc 1 * (4/4) = 1; random diagonal at full depth
    // equals the overall qini: (2 - 1 * 4/4) * 8/8 = 1
    assert(t2.getAs[Double]("qini") === 1.0)
    assert(t2.getAs[Double]("qini_random") === 1.0)
    // tile-2 uplift: 0/2 - 1/2 = -0.5
    assert(t2.getAs[Double]("uplift") === -0.5)
  }

  test("basketPairs: lift from exact counts, deterministic top-k") {
    // baskets: {a,b} x3, {a,c}, {b,c}; N=5
    val bi = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"), (3L, "b"),
      (4L, "a"), (4L, "c"), (5L, "b"), (5L, "c"))
      .toDF("basket", "item")
    val got = Association.basketPairs(bi, "basket", "item", topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getAs[Double]("lift")))
    // ab: n=3, na=4, nb=4 -> lift 3*5/16 = 0.9375
    // ac: 1*5/(4*2) = 0.625 ; bc: 1*5/(4*2) = 0.625 -> tie broken (a<b)
    assert(got.toSeq === Seq(
      ("a", "b", 3L, 0.9375), ("a", "c", 1L, 0.625)))
  }

  test("extractDelta: I/U/D ops; upsert round-trips to the new snapshot") {
    val old = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "z", 3.0))
      .toDF("k", "name", "v")
    val nw = Seq((1L, "x", 1.0), (2L, "y", 9.0), (4L, "w", 4.0))
      .toDF("k", "name", "v")
    val delta = Merge.extractDelta(old, nw, "k", Seq("name", "v"))
    val ops = delta.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops === Map(2L -> "U", 3L -> "D", 4L -> "I"))
    // round-trip: apply the delta (with payload joined from new/old)
    val payload = delta
      .join(nw.withColumnRenamed("k", "__nk"), $"k" === $"__nk", "left")
      .select($"k", $"op",
        $"name", $"v")
    val merged = Merge.upsert(old, payload, "k", "op")
    assert(merged.orderBy($"k").collect().map(_.toSeq).toSeq ===
      nw.orderBy($"k").collect().map(_.toSeq).toSeq)
  }

  test("PlanFacts: counts broadcasts and shuffles on a known plan") {
    val big = spark.range(0, 10000).toDF("id")
    val dim = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    val joined = big.join(broadcast(dim), Seq("id"))
      .groupBy($"tag").count()
    joined.collect()
    val f = PlanFacts.audit(joined)
    assert(f.broadcasts === 1, f)
    assert(f.shuffles >= 1, f)
    assert(f.hashJoins === 1, f)
    assert(!f.hasCartesian)
    assert(f.codegenSpans >= 1, f)
    // a small crossJoin side broadcasts (BroadcastNestedLoopJoin — the
    // sanctioned pattern, NOT flagged); force a true cartesian by
    // disabling auto-broadcast
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(thresholdKey)
    try {
      spark.conf.set(thresholdKey, "-1")
      val cart = big.as("a").crossJoin(spark.range(0, 3).toDF("j"))
      assert(PlanFacts.audit(cart).hasCartesian)
    } finally spark.conf.set(thresholdKey, saved)
  }
}

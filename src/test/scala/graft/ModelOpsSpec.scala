package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventAnalytics, Experiment, Geo, TimeSeries, Topics}

class ModelOpsSpec extends SparkSpec {
  import spark.implicits._

  test("ldaEmStep: thetas are a distribution per doc (sum 1, k rows) and " +
    "distinct vocabularies pull docs toward different topics") {
    val docs = Seq(
      (1L, "alpha alpha alpha beta"), (2L, "alpha alpha beta beta"),
      (3L, "gamma gamma delta delta"), (4L, "gamma delta delta delta"))
      .toDF("doc_id", "text")
    val out = Topics.ldaEmStep(docs, "text", "doc_id", k = 3)
    assert(out.count() === 12)
    val sums = out.groupBy(col("doc_id"))
      .agg(sum(col("theta")).as("s")).select(col("s")).as[Double].collect()
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-9))
    val all = out.select(col("theta")).as[Double].collect()
    assert(all.forall(t => t >= 0 && t <= 1))
  }

  test("ldaTopWords: per-topic phis normalize and ranks are 1..top") {
    val docs = Seq(
      (1L, "x x y"), (2L, "y z z"), (3L, "x z w"))
      .toDF("doc_id", "text")
    val out = Topics.ldaTopWords(docs, "text", "doc_id", k = 2, top = 3)
      .collect()
    assert(out.map(_.getAs[Int]("rank")).forall(r => r >= 1 && r <= 3))
    // 2 topics x top-3 of a 4-word vocab
    assert(out.length === 6)
  }

  test("interpolateDaily: a one-day gap interpolates to the midpoint; " +
    "observed days keep their exact sums; endpoints never extrapolate") {
    val day = 86400L * 1000000L
    val df = Seq(
      ("a", 0L, 10.0), ("a", 0L, 2.0), // day 0 sum 12
      ("a", 2 * day, 20.0),            // day 2; day 1 missing
      ("b", day, 5.0))
      .toDF("k", "us", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = TimeSeries.interpolateDaily(df, "k", "ts", "v")
      .orderBy(col("k"), col("day"))
      .select(col("k"), col("day"), col("value"), col("interpolated"))
      .as[(String, Long, Double, Boolean)].collect()
    assert(out.toSeq === Seq(
      ("a", 0L, 12.0, false), ("a", 1L, 16.0, true), ("a", 2L, 20.0, false),
      ("b", 1L, 5.0, false)))
  }

  test("haversineKm: zero at identity, ~111.19 km per degree of " +
    "latitude, symmetric") {
    val df = Seq((0.0, 0.0, 0.0, 0.0), (0.0, 0.0, 1.0, 0.0),
      (1.0, 0.0, 0.0, 0.0)).toDF("a", "b", "c", "d")
      .select(Geo.haversineKm(col("a"), col("b"), col("c"), col("d"))
        .as("km")).as[Double].collect()
    assert(df(0) === 0.0)
    assert(math.abs(df(1) - 111.1949) < 1e-3)
    assert(df(1) === df(2))
  }

  test("nearestSite picks the argmin with id tie-break; radiusJoin " +
    "finds the same in-radius pairs as a brute-force filter") {
    val pts = Seq((1L, 10.05, 20.05), (2L, 50.0, -120.0)).toDF("id", "lat", "lon")
    val sites = Seq((100L, 10.0, 20.0), (200L, 10.1, 20.1), (300L, 49.0, -121.0))
      .toDF("site_id", "slat", "slon")
    val near = Geo.nearestSite(pts, Seq("id"), "lat", "lon",
        sites, "site_id", "slat", "slon")
      .select(col("id"), col("site_id")).as[(Long, Long)].collect().toMap
    assert(near(2L) === 300L)
    assert(Set(100L, 200L).contains(near(1L))) // equidistant-ish: must pick one deterministically
    val rj = Geo.radiusJoin(pts, "lat", "lon", sites, "slat", "slon",
      radiusKm = 200.0, cellDeg = 2.0)
      .select(col("id"), col("site_id")).as[(Long, Long)].collect().toSet
    val brute = pts.join(sites)
      .withColumn("d", Geo.haversineKm(col("lat"), col("lon"), col("slat"), col("slon")))
      .filter(col("d") <= 200.0)
      .select(col("id"), col("site_id")).as[(Long, Long)].collect().toSet
    assert(rj === brute)
    assert(brute.contains((2L, 300L)))
  }

  test("nearestSite keeps fully-duplicate point rows when their ids differ") {
    val pts = Seq((1L, 10.0, 20.0), (2L, 10.0, 20.0), (3L, 10.0, 20.0))
      .toDF("id", "lat", "lon")
    val sites = Seq((100L, 10.0, 20.0), (200L, 50.0, 60.0))
      .toDF("site_id", "slat", "slon")
    val out = Geo.nearestSite(pts, Seq("id"), "lat", "lon",
      sites, "site_id", "slat", "slon")
    // partitioning the argmin window on all point columns instead of the
    // id would collapse these three identical points into one output row
    assert(out.count() === 3L)
    assert(out.select("site_id").distinct().as[Long].collect().toSeq === Seq(100L))
  }

  test("psmAtt: hand-checked nearest-control matching with caliper") {
    // treated scores 0.10, 0.50; controls at 0.11 (y=1), 0.49 (y=2), 0.90 (y=9)
    val treated = Seq((1L, 0.10, 5.0), (2L, 0.50, 7.0), (3L, 0.99, 4.0))
      .toDF("id", "score", "y")
    val controls = Seq((10L, 0.11, 1.0), (11L, 0.49, 2.0), (12L, 0.90, 9.0))
      .toDF("id", "score", "y")
    val r = Experiment.psmAtt(treated, controls, "score", "y", "id",
      caliper = 0.02).collect().head
    assert(r.getAs[Long]("n_treated") === 3L)
    // treated 3 (0.99) has no control within 0.02
    assert(r.getAs[Long]("n_matched") === 2L)
    // att = ((5-1) + (7-2)) / 2 = 4.5
    assert(r.getAs[Double]("att") === 4.5)
  }

  test("hmmViterbiScore: single event scores max-path closed form; " +
    "Viterbi never exceeds forward likelihood") {
    val df = Seq((1L, 1L, "purchase"), (2L, 1L, "click"), (2L, 2L, "error"))
      .toDF("u", "eid", "et")
      .withColumn("ts", timestamp_micros(col("eid") * 1000000L))
    val em = Seq("click" -> (0.3, 0.15), "view" -> (0.4, 0.1),
      "signup" -> (0.1, 0.15), "purchase" -> (0.05, 0.5),
      "error" -> (0.15, 0.1))
    val v = EventAnalytics.hmmViterbiScore(df, "u", "ts", "eid", "et", em)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("viterbi_logprob"), r.getInt(3))).toMap
    // u=1 purchase: v0 = max(ln.6+ln.85, ln.4+ln.25) + ln.05;
    //               v1 = max(ln.6+ln.15, ln.4+ln.75) + ln.5
    val v0 = math.max(math.log(0.6) + math.log(0.85),
      math.log(0.4) + math.log(0.25)) + math.log(0.05)
    val v1 = math.max(math.log(0.6) + math.log(0.15),
      math.log(0.4) + math.log(0.75)) + math.log(0.5)
    assert(v(1L)._1 === math.max(v0, v1))
    assert(v(1L)._2 === (if (v0 >= v1) 0 else 1))
    val fwd = EventAnalytics.hmmForward(df, "u", "ts", "eid", "et", em)
      .collect().map(r => r.getLong(0) ->
        r.getAs[Double]("log_likelihood")).toMap
    assert(v(1L)._1 <= fwd(1L) + 1e-12)
    assert(v(2L)._1 <= fwd(2L) + 1e-12)
  }

  test("dimTruncationRecall: full-width prefix recalls 1.0 and recall " +
    "is monotone-friendly (bounded in [0,1])") {
    val rnd = new scala.util.Random(7)
    val em = (0L until 40L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.dimTruncationRecall(
      em, em.filter(col("vec_id") < 3), "vec_id", "embedding",
      Seq(4, 16), k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        r.getAs[Double]("recall")).toMap
    assert(out.keys.map(_._1).toSet === Set(4, 16))
    assert(out.forall { case (_, r) => r >= 0.0 && r <= 1.0 })
    // truncating to the full width changes nothing
    assert(out.filter(_._1._1 == 16).values.forall(_ === 1.0))
  }

  test("partialAggAudit: merged shard summaries equal the direct pass " +
    "exactly for every key") {
    val df = Seq((1L, "a", 1.25), (2L, "a", 2.5), (3L, "b", -1.0),
      (4L, "b", 7.75), (5L, "a", 0.125), (6L, "b", 3.0))
      .toDF("id", "k", "v")
    val out = graft.operators.ScaleAudit.partialAggAudit(
      df, pmod(col("id"), lit(3L)), "k", "v").collect()
    assert(out.length === 2)
    assert(out.forall(_.getAs[Boolean]("merge_exact")))
    val a = out.find(_.getString(0) == "a").get
    assert(a.getAs[Long]("n") === 3L)
    assert(a.getAs[Double]("total") === 3.875)
  }

  test("intervalOverlapJoin: overlapping pairs once each (even across " +
    "bucket boundaries), disjoint and cross-key pairs never") {
    val a = Seq((1L, "u", 100L, 250L), (2L, "u", 900L, 950L),
      (3L, "v", 100L, 250L)).toDF("a_id", "k", "a_s", "a_e")
    val b = Seq((10L, "u", 200L, 320L), (11L, "u", 260L, 280L),
      (12L, "u", 951L, 999L)).toDF("b_id", "k", "b_s", "b_e")
    // bucket width 50: pair (1,10) overlaps on [200,250] and would share
    // buckets 200 and 250 — must emit once
    val out = graft.operators.RangeJoin.intervalOverlapJoin(
      a, b, "a_s", "a_e", "b_s", "b_e", Seq("k"), bucketWidth = 50L)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toList
    assert(out.sorted === List((1L, 10L)))
  }

  test("skyline2d: keeps exactly the non-dominated rows, ties on both " +
    "axes all survive") {
    val df = Seq((1L, 5.0, 10L), (2L, 5.0, 10L), // tied pair, both kept
      (3L, 6.0, 9L), (4L, 6.0, 8L),  // 4 dominated by 3 (same x, lower y)
      (5L, 4.0, 11L), (6L, 3.0, 11L) // 6 dominated by 5 (same y, lower x)
    ).toDF("id", "x", "y")
    val kept = graft.operators.Eda.skyline2d(df, "x", "y")
      .select(col("id")).as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 5L))
  }

  test("applyAggDelta: inserts, retractions, new keys, and zero-count " +
    "drop-out all maintain the exact view") {
    val state = Seq(("a", 2L, BigDecimal("3.500000")),
      ("b", 1L, BigDecimal("1.000000")))
      .toDF("k", "n", "s")
      .withColumn("s", col("s").cast("decimal(30,6)"))
    val deltas = Seq(("a", 1, 2.5), ("b", -1, 1.0), ("c", 1, 7.0))
      .toDF("k", "op", "v")
    val out = graft.operators.Merge.applyAggDelta(
      state, deltas, "k", "n", "s", "op", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
    // b retracted to n=0 -> dropped; c enters fresh
    assert(out === Map("a" -> ((3L, 6.0)), "c" -> ((1L, 7.0))))
  }

  test("hmmForward: single purchase event scores the closed form; " +
    "likelihood decomposes per step") {
    val df = Seq(
      (1L, 1L, "purchase"),
      (2L, 1L, "click"), (2L, 2L, "click"))
      .toDF("u", "eid", "et")
      .withColumn("ts", timestamp_micros(col("eid") * 1000000L))
    val em = Seq("click" -> (0.3, 0.15), "view" -> (0.4, 0.1),
      "signup" -> (0.1, 0.15), "purchase" -> (0.05, 0.5),
      "error" -> (0.15, 0.1))
    val out = EventAnalytics.hmmForward(df, "u", "ts", "eid", "et", em)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getAs[Double]("log_likelihood"),
          r.getAs[Double]("p_state0"))).toMap
    // step 1 from pi=(0.6,0.4): t=(0.6*0.85+0.4*0.25, 0.6*0.15+0.4*0.75)
    //   = (0.61, 0.39); purchase: u=(0.61*0.05, 0.39*0.5)=(0.0305,0.195)
    val s1 = 0.61 * 0.05 + 0.39 * 0.5
    assert(out(1L)._1 === 1L)
    assert(math.abs(out(1L)._2 - math.log(s1)) < 1e-12)
    assert(math.abs(out(1L)._3 - 0.61 * 0.05 / s1) < 1e-12)
    // two clicks: ll accumulates two step masses
    val a0 = (0.61 * 0.3, 0.39 * 0.15)
    val m1 = a0._1 + a0._2
    val n1 = (a0._1 / m1, a0._2 / m1)
    val t2 = (n1._1 * 0.85 + n1._2 * 0.25, n1._1 * 0.15 + n1._2 * 0.75)
    val m2 = t2._1 * 0.3 + t2._2 * 0.15
    assert(out(2L)._1 === 2L)
    assert(math.abs(out(2L)._2 - (math.log(m1) + math.log(m2))) < 1e-12)
  }
}

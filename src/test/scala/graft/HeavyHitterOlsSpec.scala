package graft

import org.apache.spark.sql.functions._

import graft.operators.{Evaluation, Experiment, HeavyHitters}

class HeavyHitterOlsSpec extends SparkSpec {
  import spark.implicits._

  test("olsByGroup: recovers an exact line and a known noisy fit") {
    // exact line y = 3x + 2 -> slope 3, intercept 2, r2 = 1
    val exact = (1 to 50).map(i => ("a", i.toDouble, 3.0 * i + 2.0))
      .toDF("g", "x", "y")
    val r = Experiment.olsByGroup(exact, "g", "x", "y").collect().head
    assert(math.abs(r.getAs[Double]("slope") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-9)
    // hand-checked 3-point fit: (0,0),(1,1),(2,4) -> slope 2, int -1/3
    val tiny = Seq(("b", 0.0, 0.0), ("b", 1.0, 1.0), ("b", 2.0, 4.0))
      .toDF("g", "x", "y")
    val t = Experiment.olsByGroup(tiny, "g", "x", "y").collect().head
    assert(math.abs(t.getAs[Double]("slope") - 2.0) < 1e-9)
    assert(math.abs(t.getAs[Double]("intercept") + 1.0 / 3.0) < 1e-9)
  }

  test("olsByGroup: zero x-variance yields nulls, not NaN") {
    val df = Seq(("c", 1.0, 2.0), ("c", 1.0, 5.0)).toDF("g", "x", "y")
    val r = Experiment.olsByGroup(df, "g", "x", "y").collect().head
    assert(r.isNullAt(r.fieldIndex("slope")))
    assert(r.isNullAt(r.fieldIndex("r2")))
  }

  test("brierDecomposition: Murphy identity holds exactly; perfect " +
    "calibration zeroes reliability") {
    // scores exactly at bin centers, labels drawn to match: bin 0.25
    // has 1/4 positives, bin 0.75 has 3/4 positives
    val rows = (1 to 40).map { i =>
      if (i <= 20) (0.25, if (i % 4 == 0) 1 else 0)
      else (0.75, if (i % 4 != 0) 1 else 0)
    }
    val df = rows.toDF("score", "label")
    val r = Evaluation.brierDecomposition(df, "score", "label", bins = 2)
      .collect().head
    val (br, rel, res, unc) = (r.getAs[Double]("brier"),
      r.getAs[Double]("reliability"), r.getAs[Double]("resolution"),
      r.getAs[Double]("uncertainty"))
    assert(math.abs(rel) < 1e-9) // forecasts equal bin outcome rates
    assert(math.abs(br - (rel - res + unc)) < 1e-9) // exact identity
    assert(math.abs(unc - 0.25) < 1e-9) // ybar = 1/2
    assert(math.abs(res - 0.0625) < 1e-9) // both bins 1/4 from ybar
  }

  test("heavyHitters: exact counts, guarantee holds, partition-proof") {
    // 'hot' appears 300/1000 times, 'warm' 80/1000, tail unique
    val items = (1 to 1000).map { i =>
      if (i <= 300) "hot" else if (i <= 380) "warm" else s"t$i"
    }
    val df = items.toDF("item")
    val out = HeavyHitters.heavyHitters(df, "item", minFraction = 0.05)
      .collect()
    assert(out.map(_.getString(0)).toSeq === Seq("hot", "warm"))
    assert(out.head.getAs[Long]("cnt") === 300L)
    assert(out(1).getAs[Long]("cnt") === 80L)
    // same answer under a different partition layout
    val repart = HeavyHitters.heavyHitters(
      df.repartition(13), "item", minFraction = 0.05).collect()
    assert(repart.map(r => (r.getString(0), r.getAs[Long]("cnt"))).toSeq ===
      out.map(r => (r.getString(0), r.getAs[Long]("cnt"))).toSeq)
    // threshold is strict: an item at exactly the fraction is excluded
    val edge = ((1 to 50).map(_ => "x") ++ (1 to 950).map(i => s"u$i"))
      .toDF("item")
    assert(HeavyHitters.heavyHitters(edge, "item", 0.05).count() === 0L)
  }

  test("mgCandidates: every global heavy hitter survives a tiny sketch") {
    val stream = (1 to 900).map(i => s"noise$i") ++ (1 to 100).map(_ => "h")
    val cands = HeavyHitters.mgCandidates(12)(stream.iterator).toSet
    assert(cands.contains("h")) // freq 0.1 > 1/12, must survive
  }

  test("kmvSetOps: exact path below k, estimate path above, Jaccard " +
    "in a sane band") {
    import spark.implicits._
    // |A| = 30, |B| = 30, |A∩B| = 10, |A∪B| = 50
    val a = ((1 to 20).map(i => s"only_a_$i") ++
      (1 to 10).map(i => s"both_$i")).toDF("item")
    val b = ((1 to 20).map(i => s"only_b_$i") ++
      (1 to 10).map(i => s"both_$i")).toDF("item")
    // k = 64 > |A∪B|: the sketches ARE the sets — exact everywhere
    val ex = HeavyHitters.kmvSetOps(a, b, "item", 64).collect().head
    assert(ex.getAs[Long]("exact_union") === 50L)
    assert(ex.getAs[Long]("exact_intersection") === 10L)
    assert(ex.getAs[Long]("union_sketch_size") === 50L)
    assert(ex.getAs[Long]("matches_below_theta") === 10L)
    assert(ex.getAs[Double]("est_union") === 50.0)
    assert(ex.getAs[Double]("est_intersection") === 10.0)
    assert(ex.getAs[Double]("est_jaccard") === 0.2)

    // k = 16 < |A∪B|: genuine estimation — deterministic given md5,
    // and within a loose band of the truth (k is tiny on purpose)
    val est = HeavyHitters.kmvSetOps(a, b, "item", 16).collect().head
    assert(est.getAs[Long]("union_sketch_size") === 16L)
    val eu = est.getAs[Double]("est_union")
    val ej = est.getAs[Double]("est_jaccard")
    assert(eu > 15.0 && eu < 200.0, s"est_union $eu")
    assert(ej >= 0.0 && ej <= 1.0)
    // rerun: content-stable (no randomness anywhere)
    val est2 = HeavyHitters.kmvSetOps(a, b, "item", 16).collect().head
    assert(est2.getAs[Double]("est_union") === eu)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Encoding, Evaluation, TimeSeries}

class DriftCalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("isotonicCalibration: already-monotone rates pass through; " +
    "violations pool to the PAV weighted means") {
    // bins 0/5/9 with rates 0.2 / 0.5 / 0.8 (monotone): iso == raw
    val mono = (1 to 30).map { i =>
      val (s, frac) =
        if (i <= 10) (0.05, 2) else if (i <= 20) (0.55, 5) else (0.95, 8)
      (s, if (i % 10 < frac) 1 else 0)
    }.toDF("score", "label")
    val m = Evaluation.isotonicCalibration(mono, "score", "label")
      .orderBy(col("bin")).collect()
    m.foreach(r => assert(
      math.abs(r.getAs[Double]("rate") - r.getAs[Double]("iso_rate")) < 1e-9))
    // violation: bin0 rate 0.8 (4/5), bin9 rate 0.2 (1/5), equal sizes
    // -> pooled to 0.5 across both
    val viol = (Seq.fill(4)((0.05, 1)) ++ Seq((0.05, 0)) ++
      Seq((0.95, 1)) ++ Seq.fill(4)((0.95, 0))).toDF("score", "label")
    val v = Evaluation.isotonicCalibration(viol, "score", "label")
      .orderBy(col("bin")).collect()
    assert(v.forall(r => math.abs(r.getAs[Double]("iso_rate") - 0.5) < 1e-9))
    // iso_rate monotone in bin, always
    val iso = m.map(_.getAs[Double]("iso_rate"))
    assert(iso.sameElements(iso.sorted))
  }

  test("hillTailIndex: recovers a Pareto tail index; cvar brackets " +
    "the VaR") {
    import graft.operators.NumericFeatures
    // exact Pareto(alpha=2) inverse-CDF sample: x = (1-u)^(-1/2) on a
    // uniform grid -> Hill over the top 100 of 10000 should land near 2
    val n = 10000
    val xs = (1 to n).map(i => math.pow(i.toDouble / (n + 1), -0.5))
    val df = xs.toDF("v")
    val h = NumericFeatures.hillTailIndex(df, "v", k = 100)
      .collect().head
    val alpha = h.getAs[Double]("alpha")
    assert(alpha > 1.6 && alpha < 2.4, s"hill alpha off: $alpha")
    // cvar: uniform 1..100, p95 -> VaR 95.05; tail mean of {96..100}=98
    val u = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val c = NumericFeatures.cvarByGroup(u, "g", "v", 0.95).collect().head
    assert(c.getAs[Double]("var_q") === 95.05)
    assert(c.getAs[Long]("n_tail") === 5L)
    assert(c.getAs[Double]("cvar") === 98.0)
  }

  test("maxDrawdown: cumulative dips measured from the running peak") {
    import java.sql.Timestamp
    def ts(day: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-$day%02d 08:00:00")
    // daily sums: +10, -4, -3, +12, -6 -> cum 10,6,3,15,9
    // peak 10,10,10,15,15 -> drawdowns 0,4,7,0,6 -> max 7
    val df = Seq((1, 10.0), (2, -4.0), (3, -3.0), (4, 12.0), (5, -6.0))
      .map { case (d, v) => ("k", ts(d), v) }.toDF("key", "ts", "v")
    val r = TimeSeries.maxDrawdown(df, "key", "ts", "v").collect().head
    assert(r.getAs[Long]("n_days") === 5L)
    assert(r.getAs[Double]("final_value") === 9.0)
    assert(r.getAs[Double]("peak_value") === 15.0)
    assert(r.getAs[Double]("max_drawdown") === 7.0)
  }

  test("distributionDistances: identical slices -> ~0; disjoint " +
    "slices -> near the bounds") {
    // i/2 decouples bin from parity: each consecutive pair lands both
    // slices in the SAME bin (i%10 would correlate bin with slice and
    // silently make the slices disjoint)
    val same = (0 until 400).map(i => ((i / 2 % 10) * 10.0 + 5.0, i % 2))
      .toDF("v", "slice")
    val s = Encoding.distributionDistances(same, "v", "slice", 0.0, 100.0)
      .collect().head
    assert(s.getAs[Double]("hellinger") < 1e-6)
    assert(s.getAs[Double]("js_nats") < 1e-9)
    // slice 0 all in bin 0, slice 1 all in bin 9
    val apart = ((1 to 100).map(_ => (5.0, 0)) ++
      (1 to 100).map(_ => (95.0, 1))).toDF("v", "slice")
    val a = Encoding.distributionDistances(apart, "v", "slice", 0.0, 100.0)
      .collect().head
    assert(a.getAs[Double]("hellinger") > 0.9) // smoothing keeps it < 1
    assert(a.getAs[Double]("js_nats") > 0.6) // bound ln 2 ~ 0.693
    assert(a.getAs[Double]("js_nats") <= math.log(2.0) + 1e-9)
  }

  test("passAtK: closed forms, saturation, and undefined-k") {
    import graft.operators.Evaluation
    // task 1: n=5, c=2 -> pass@1 = 1 - 3/5 = 0.4,
    // pass@5: c >= n-5+1=1 -> exactly 1.0
    // task 2: n=3 (< 5) -> pass@5 NULL; c=0 -> pass@1 = 0
    val df = (Seq.fill(2)((1L, true)) ++ Seq.fill(3)((1L, false)) ++
      Seq.fill(3)((2L, false))).toDF("task", "ok")
    val got = Evaluation.passAtK(df, "task", col("ok"), ks = Seq(1, 5))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(math.abs(got(1L).getAs[Double]("pass_at_1") - 0.4) < 1e-12)
    assert(got(1L).getAs[Double]("pass_at_5") === 1.0)
    assert(got(2L).getAs[Double]("pass_at_1") === 0.0)
    assert(got(2L).isNullAt(got(2L).fieldIndex("pass_at_5")))
    // exact C(n-c,k)/C(n,k) cross-check: n=10, c=3, k=4
    // 1 - C(7,4)/C(10,4) = 1 - 35/210 = 5/6
    val df2 = (Seq.fill(3)((9L, true)) ++ Seq.fill(7)((9L, false)))
      .toDF("task", "ok")
    val g2 = Evaluation.passAtK(df2, "task", col("ok"), ks = Seq(4))
      .collect().head
    assert(math.abs(g2.getAs[Double]("pass_at_4") - 5.0 / 6.0) < 1e-12)
  }
}

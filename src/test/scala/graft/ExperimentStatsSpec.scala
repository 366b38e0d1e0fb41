package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bootstrap, Evaluation, Experiment, Inequality, Mixture}

/** Unit pins for the round-7 statistics batch: CUPED, ANOVA, Gini,
  * average precision, Poisson bootstrap, weighted sampling.
  */
class ExperimentStatsSpec extends SparkSpec {
  import spark.implicits._

  test("cuped: perfectly correlated covariate collapses both variants " +
    "onto the pooled prediction") {
    // y = 2x exactly -> theta = 2, adjusted means all equal the pooled
    // post mean (every unit's residual y - theta*(x - xbar) = 2*xbar)
    val rows = Seq(
      (1L, 0, 1.0, 2.0), (2L, 0, 2.0, 4.0), (3L, 0, 3.0, 6.0),
      (4L, 1, 4.0, 8.0), (5L, 1, 5.0, 10.0), (6L, 1, 6.0, 12.0))
    val df = rows.flatMap { case (u, g, x, y) =>
      Seq((u, g, x, true), (u, g, y, false))
    }.toDF("unit", "variant", "v", "pre")
    val out = Experiment.cuped(df, "unit", "variant", "v", col("pre"))
      .collect().sortBy(_.getInt(0))
    assert(out.length === 2)
    val theta = out(0).getAs[Double]("theta")
    assert(math.abs(theta - 2.0) < 1e-9)
    val adj0 = out(0).getAs[Double]("mean_adj")
    val adj1 = out(1).getAs[Double]("mean_adj")
    // pooled xbar = 3.5 -> both variants adjust to 2*3.5 = 7.0
    assert(math.abs(adj0 - 7.0) < 1e-9)
    assert(math.abs(adj1 - 7.0) < 1e-9)
    assert(out(0).getAs[Double]("mean_post") === 4.0)
    assert(out(1).getAs[Double]("mean_post") === 10.0)
  }

  test("anovaF: textbook two-group case equals the squared t statistic") {
    // groups {1,2,3} and {4,5,6}: F = t^2 with t from the pooled-var
    // two-sample t test; here means 2 vs 5, pooled var 1 -> t^2 = 13.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val row = Experiment.anovaF(df, "g", "v").collect().head
    assert(row.getAs[Long]("k") === 2L)
    assert(row.getAs[Long]("n") === 6L)
    assert(math.abs(row.getAs[Double]("ss_between") - 13.5) < 1e-9)
    assert(math.abs(row.getAs[Double]("ss_within") - 4.0) < 1e-9)
    assert(math.abs(row.getAs[Double]("f_stat") - 13.5) < 1e-9)
  }

  test("giniByGroup: equal values -> 0; extreme concentration -> (n-1)/n") {
    val df = Seq(("eq", 5.0), ("eq", 5.0), ("eq", 5.0), ("eq", 5.0),
      ("one", 0.0), ("one", 0.0), ("one", 0.0), ("one", 12.0))
      .toDF("g", "v")
    val out = Inequality.giniByGroup(df, "g", "v").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("gini")).toMap
    assert(math.abs(out("eq")) < 1e-12)
    assert(math.abs(out("one") - 0.75) < 1e-12) // (n-1)/n = 3/4
  }

  test("giniByGroup: ties match the row_number closed form") {
    // values 1,1,2: G = (2*(1*1+2*1+3*2) - 4*4) / (3*4) = (18-16)/12
    val df = Seq(("g", 1.0), ("g", 1.0), ("g", 2.0)).toDF("g", "v")
    val g = Inequality.giniByGroup(df, "g", "v").collect().head
      .getAs[Double]("gini")
    assert(math.abs(g - 2.0 / 12.0) < 1e-12)
  }

  test("averagePrecision: perfect ranking -> 1.0; known interleaving") {
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))
      .toDF("score", "label")
    val apPerfect = Evaluation.averagePrecision(perfect, "score", "label")
      .collect().head.getAs[Double]("ap")
    assert(math.abs(apPerfect - 1.0) < 1e-9)
    // ranking pos@1, neg@2, pos@3: AP = (1/2)*(1/1 + 2/3)
    val mixed = Seq((0.9, 1), (0.5, 0), (0.3, 1)).toDF("score", "label")
    val ap = Evaluation.averagePrecision(mixed, "score", "label")
      .collect().head.getAs[Double]("ap")
    assert(math.abs(ap - (1.0 + 2.0 / 3.0) / 2.0) < 1e-9)
  }

  test("averagePrecision: tied scores take the tie-block cut precision") {
    // all rows tied: single cut, precision = P/(P+N), AP = P/(P+N)
    val df = Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)).toDF("score", "label")
    val ap = Evaluation.averagePrecision(df, "score", "label")
      .collect().head.getAs[Double]("ap")
    assert(math.abs(ap - 0.5) < 1e-9)
  }

  test("poissonBootstrapMean: CI brackets the mean, deterministic, " +
    "weights hit the Poisson(1) profile") {
    val df = (1 to 400).map(i => (i.toLong, (i % 7).toDouble)).toDF("id", "v")
    val a = Bootstrap.poissonBootstrapMean(df, "id", "v", 50, 42L)
      .collect().head
    val b = Bootstrap.poissonBootstrapMean(df, "id", "v", 50, 42L)
      .collect().head
    assert(a === b) // hash-deterministic end to end
    val mean = a.getAs[Double]("mean")
    assert(a.getAs[Long]("n") === 400L)
    assert(a.getAs[Double]("ci_lo") < mean && mean < a.getAs[Double]("ci_hi"))
    // a different seed moves the replicate draw
    val c = Bootstrap.poissonBootstrapMean(df, "id", "v", 50, 7L)
      .collect().head
    assert(c.getAs[Double]("ci_lo") !== a.getAs[Double]("ci_lo"))
  }

  test("weightedSample: deterministic, k rows, heavy weights win more") {
    val df = (1 to 200).map(i =>
      (i.toLong, if (i <= 100) 1.0 else 100.0)).toDF("id", "w")
    val s1 = Mixture.weightedSample(df, "id", "w", 40, 42L)
    val ids = s1.select("id").collect().map(_.getLong(0))
    assert(ids.length === 40)
    val s2 = Mixture.weightedSample(df, "id", "w", 40, 42L)
      .select("id").collect().map(_.getLong(0))
    assert(ids.toSeq === s2.toSeq)
    // 100x weights should dominate the winners overwhelmingly
    val heavy = ids.count(_ > 100)
    assert(heavy >= 35, s"expected heavy-weight dominance, got $heavy/40")
    // zero/negative weights are excluded, not errors
    val withZero = df.withColumn("w",
      when(col("id") === 1L, lit(0.0)).otherwise(col("w")))
    assert(!Mixture.weightedSample(withZero, "id", "w", 40, 42L)
      .select("id").collect().map(_.getLong(0)).contains(1L))
  }

  test("normalCdf: pins the standard table values within the A&S " +
    "polynomial error bound (1.5e-7)") {
    val df = Seq(-1.959963985, 0.0, 1.644853627, 2.575829304).toDF("z")
    val out = df.select(col("z"),
      Experiment.normalCdf(col("z")).as("phi"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(0.0) - 0.5) < 1e-6)
    assert(math.abs(out(1.644853627) - 0.95) < 1e-6)
    assert(math.abs(out(2.575829304) - 0.995) < 1e-6)
    assert(math.abs(out(-1.959963985) - 0.025) < 1e-6)
  }

  test("abTestPerGroup: per-segment counts and a flat null-effect " +
    "segment yields p near 1") {
    val rows = (1 to 200).map { i =>
      val seg = if (i <= 100) "a" else "b"
      val grp = i % 2
      // segment a: treatment converts far more; segment b: identical
      // i % 4 < 2 hits even and odd i equally, so it is independent of
      // grp = i % 2 (an i % 4 == 0 rule would convert only controls)
      val conv = if (seg == "a") (if (grp == 1 && i % 3 != 0) 1 else 0)
        else (if (i % 4 < 2) 1 else 0)
      (seg, grp, conv)
    }
    val df = rows.toDF("seg", "grp", "conv")
    val out = Experiment.abTestPerGroup(df, "seg", "grp", "conv")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Double]("p_value") < 0.01)
    assert(out("b").getAs[Double]("p_value") > 0.5)
    assert(out("a").getAs[Long]("n_control") === 50L)
    assert(out("a").getAs[Long]("n_treat") === 50L)
  }

  test("bhAdjust: the textbook example rejects exactly the step-up " +
    "prefix and q-values are monotone") {
    // classic BH at alpha=0.05, m=5: p=(.01,.02,.03,.04,.2)
    // thresholds (.01,.02,.03,.04,.05): k=4 is the largest pass
    val df = Seq(("t1", 0.01), ("t2", 0.02), ("t3", 0.03),
      ("t4", 0.04), ("t5", 0.2)).toDF("id", "p")
    val out = Experiment.bhAdjust(df, "id", "p", 0.05)
      .orderBy("k_rank").collect()
    assert(out.count(_.getAs[Boolean]("rejected")) === 4)
    assert(!out.last.getAs[Boolean]("rejected"))
    val qs = out.map(_.getAs[Double]("q_value"))
    assert(qs.zip(qs.tail).forall { case (a, b) => a <= b })
    assert(math.abs(qs.head - 0.05) < 1e-9) // min(.05,.05,.05,.05,.2)
  }

  test("huberOlsByGroup: an outlier drags OLS but the IRLS step pulls " +
    "the robust slope back toward the clean line") {
    import spark.implicits._
    val clean = (1 to 20).map(i => ("g", i.toDouble, 2.0 * i + 1.0))
    val rows = clean :+ (("g", 21.0, 1000.0)) // massive outlier
    val df = rows.toDF("g", "x", "y")
    val r = Experiment.huberOlsByGroup(df, "g", "x", "y").collect().head
    val ols = r.getAs[Double]("slope_ols")
    val hub = r.getAs[Double]("slope_huber")
    assert(ols > 2.5) // outlier-dragged
    assert(math.abs(hub - 2.0) < math.abs(ols - 2.0))
    assert(r.getAs[Long]("n_downweighted") >= 1L)
    assert(r.getAs[Double]("scale") > 0.0)
  }

  test("huberOlsByGroup: an outlier-free group keeps all weights at 1 " +
    "and huber == ols") {
    import spark.implicits._
    // residuals vary so tau > 0, but no residual exceeds delta*tau by
    // enough to downweight... use exact line: tau = 0 -> weights 1
    val df = (1 to 10).map(i => ("g", i.toDouble, 3.0 * i - 2.0))
      .toDF("g", "x", "y")
    val r = Experiment.huberOlsByGroup(df, "g", "x", "y").collect().head
    assert(r.getAs[Long]("n_downweighted") === 0L)
    assert(math.abs(r.getAs[Double]("slope_huber") - 3.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("slope_ols") - 3.0) < 1e-6)
  }

  test("bhAdjust: null p-values are excluded from the family size") {
    val df = Seq(("t1", Some(0.01)), ("t2", None), ("t3", Some(0.5)))
      .toDF("id", "p")
    val out = Experiment.bhAdjust(df, "id", "p", 0.1).collect()
    assert(out.length === 2)
    assert(out.forall(_.getAs[Long]("m") === 2L))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Density, Experiment, Graphs, LinAlg, Resample,
  Sketches, TextDedup, TimeSeries}

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hllDistinct: small cardinalities hit the linear-counting branch " +
    "and land near exact; registers stay within m = 64") {
    val df = (1 to 500).map(i => ("g", (i % 20).toString)).toDF("g", "item")
    val out = Sketches.hllDistinct(df, "g", "item").collect()
    assert(out.length === 1)
    val r = out.head
    val used = r.getAs[Int]("used_registers")
    assert(used >= 1 && used <= 64)
    assert(r.getAs[Int]("zero_registers") === 64 - used)
    assert(r.getAs[Long]("exact") === 20L)
    // linear counting at 20 distinct in 64 registers: well under 50% err
    assert(math.abs(r.getAs[Double]("est") - 20.0) / 20.0 < 0.5)
  }

  test("hllDistinct: estimate is insensitive to duplication and " +
    "partitioning (pure distinct semantics)") {
    val once = (1 to 300).map(i => ("g", s"u$i")).toDF("g", "item")
    val dup = once.unionAll(once).unionAll(once).repartition(13)
    val a = Sketches.hllDistinct(once, "g", "item").collect().head
    val b = Sketches.hllDistinct(dup, "g", "item").collect().head
    assert(a.getAs[Double]("est") === b.getAs[Double]("est"))
    assert(a.getAs[Long]("exact") === b.getAs[Long]("exact"))
    // m = 64 gives ~13% standard error; 300 distinct should estimate
    // within 3 sigma
    assert(math.abs(a.getAs[Double]("est") - 300.0) / 300.0 < 0.4)
  }

  test("ridgeNormalEq: lambda = 0 on exactly-linear data recovers the " +
    "generating coefficients") {
    val df = (1 to 100).map { i =>
      val x1 = i.toDouble; val x2 = (i % 7).toDouble
      (2.0 + 3.0 * x1 - 5.0 * x2, x1, x2)
    }.toDF("y", "x1", "x2")
    val betas = LinAlg.ridgeNormalEq(df, "y", "x1", "x2", lambda = 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(betas("intercept") - 2.0) < 1e-4)
    assert(math.abs(betas("x1") - 3.0) < 1e-4)
    assert(math.abs(betas("x2") - (-5.0)) < 1e-4)
  }

  test("ridgeNormalEq: growing lambda shrinks slope magnitudes") {
    val df = (1 to 50).map { i =>
      val x1 = i.toDouble; val x2 = (i % 5).toDouble
      (1.0 + 2.0 * x1 + 4.0 * x2, x1, x2)
    }.toDF("y", "x1", "x2")
    def slopes(lam: Double) =
      LinAlg.ridgeNormalEq(df, "y", "x1", "x2", lam)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val loose = slopes(0.0)
    val tight = slopes(1000.0)
    assert(math.abs(tight("x2")) < math.abs(loose("x2")))
  }

  test("holtLinear: constant series locks level to the constant and " +
    "trend to zero; row per observed day") {
    val day = 86400L * 1000000L
    // 4 days x 3 events each
    val df = (0 until 4).flatMap(d => (1 to 3).map(i => d * day + i * 1000L))
      .toDF("us").withColumn("ts", timestamp_micros(col("us")))
    val out = TimeSeries.holtLinear(df, "ts", alpha = 0.3, gamma = 0.2)
      .orderBy(col("day")).collect()
    assert(out.length === 4)
    assert(out.forall(r => math.abs(r.getAs[Double]("level") - 3.0) < 1e-8))
    assert(out.forall(r => math.abs(r.getAs[Double]("trend")) < 1e-8))
  }

  test("holtLinear: replays the textbook recursion exactly") {
    val day = 86400L * 1000000L
    val counts = Seq(2, 5, 3, 7) // events per day
    val df = counts.zipWithIndex.flatMap { case (n, d) =>
      (1 to n).map(i => d * day + i * 1000L)
    }.toDF("us").withColumn("ts", timestamp_micros(col("us")))
    val out = TimeSeries.holtLinear(df, "ts", alpha = 0.3, gamma = 0.2)
      .orderBy(col("day"))
      .select(col("x"), col("level"), col("trend"))
      .as[(Double, Double, Double)].collect()
    var s = 2.0; var b = 5.0 - 2.0
    val expected = Seq((2.0, s, b)) ++ counts.drop(1).map { n =>
      val sNew = 0.3 * n + 0.7 * (s + b)
      b = 0.2 * (sNew - s) + 0.8 * b
      s = sNew
      (n.toDouble, math.floor(s * 1e9) / 1e9, math.floor(b * 1e9) / 1e9)
    }
    assert(out.toSeq === expected)
  }

  test("holtLinear: fewer than two observed days yields no rows") {
    val df = Seq(1000L, 2000L).toDF("us")
      .withColumn("ts", timestamp_micros(col("us")))
    assert(TimeSeries.holtLinear(df, "ts").count() === 0)
  }

  test("prefixFilterJaccardPairs: finds exactly the ground-truth pairs " +
    "(recall 1 vs brute force) with exact jaccard values") {
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e g"),  // high overlap
      (3L, "a b c x y z"),                        // partial
      (4L, "p q r s t u"), (5L, "p q r s t u"))  // identical
      .toDF("doc_id", "text")
    val out = TextDedup
      .prefixFilterJaccardPairs(docs, "text", "doc_id", n = 3,
        threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))
      .as[(Long, Long, Double)].collect()
    // 4-shingle sets: {1,2} share 3 of 5 distinct (j=0.6); {4,5}
    // identical (j=1); {1,3}/{2,3} share 1 of 7 (j≈0.14, below)
    assert(out.toSeq === Seq((1L, 2L, 0.6), (4L, 5L, 1.0)))
  }

  test("prefixFilterJaccardPairs: threshold 1 keeps only exact sets") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "a b c e"))
      .toDF("doc_id", "text")
    val out = TextDedup
      .prefixFilterJaccardPairs(docs, "text", "doc_id", n = 2,
        threshold = 1.0)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("modularity: a two-clique graph with one bridge scores high for " +
    "the clique partition and the integer aggregates are exact") {
    // cliques {1,2,3} and {4,5,6} plus bridge 3-4: m = 7
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("id_a", "id_b")
    val assign = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 2L), (5L, 2L), (6L, 2L)).toDF("id", "c")
    val r = Graphs.modularity(assign, "id", "c", edges).collect().head
    assert(r.getAs[Long]("m_edges") === 7L)
    assert(r.getAs[Long]("intra_edges") === 6L)
    assert(r.getAs[Long]("n_clusters") === 2L)
    // Q = (4*7*6 - (7^2 + 7^2)) / (4*49) = (168 - 98) / 196
    val expected = math.floor(70.0 / 196.0 * 1e9) / 1e9
    assert(r.getAs[Double]("q_modularity") === expected)
  }

  test("modularity: everything in one cluster gives Q = 0 exactly") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val assign = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("id", "c")
    val r = Graphs.modularity(assign, "id", "c", edges).collect().head
    // intra = m and sum(d_c)^2 = (2m)^2 → numerator 4m² - 4m² = 0
    assert(r.getAs[Double]("q_modularity") === 0.0)
  }

  test("gridCorePoints: neighbor counts match brute force across cell " +
    "boundaries and isolated points report zero") {
    // 2-D vectors embedded in dim=4 (padding zeros); eps 1.0
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f, 0f, 0f)),
      (2L, Array(0.5f, 0.0f, 0f, 0f)),
      (3L, Array(0.0f, 0.9f, 0f, 0f)),
      (4L, Array(5.0f, 5.0f, 0f, 0f))).toDF("id", "vec")
    val out = Density.gridCorePoints(vecs, "id", "vec",
      eps = 1.0, minPts = 2, dim = 4)
      .orderBy(col("id")).collect()
    val xs = out.map(r => r.getAs[Long]("id") ->
      (r.getAs[Double]("x"), r.getAs[Double]("y"))).toMap
    // brute-force neighbor counts in the PROJECTED plane
    def d2(a: (Double, Double), b: (Double, Double)) = {
      val dx = a._1 - b._1; val dy = a._2 - b._2; dx * dx + dy * dy
    }
    val ids = xs.keys.toSeq
    val brute = ids.map(i => i ->
      ids.count(j => j != i && d2(xs(i), xs(j)) <= 1.0)).toMap
    out.foreach { r =>
      val id = r.getAs[Long]("id")
      assert(r.getAs[Long]("n_neighbors") === brute(id).toLong,
        s"id $id")
      assert(r.getAs[Boolean]("is_core") === (brute(id) >= 2))
    }
  }

  test("sprtDecision: an overwhelmingly H1 stream crosses the upper " +
    "boundary and the cumulative counts are exact") {
    val day = 86400L * 1000000L
    // 10 days, 20 trials/day, 15 successes/day (p-hat = 0.75 >> p1)
    val rows = for {
      d <- 0 until 10; i <- 0 until 20
    } yield (d * day + i * 1000L, i < 15)
    val df = rows.toDF("us", "hit")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Experiment.sprtDecision(df, "ts", col("hit"),
      p0 = 0.2, p1 = 0.4).orderBy(col("day")).collect()
    assert(out.length === 10)
    assert(out.last.getAs[Long]("n_cum") === 200L)
    assert(out.last.getAs[Long]("k_cum") === 150L)
    assert(out.last.getAs[String]("decision") === "accept_h1")
    // llr must be monotone increasing for a constant-rate stream
    // with p-hat above the H1/H0 crossover
    val llrs = out.map(_.getAs[Double]("llr"))
    assert(llrs.zip(llrs.tail).forall { case (a, b) => b > a })
  }

  test("sprtDecision: an H0-rate stream accepts H0") {
    val day = 86400L * 1000000L
    // 10 days, 20 trials/day, 2 successes/day (p-hat = 0.1 < p0)
    val rows = for {
      d <- 0 until 10; i <- 0 until 20
    } yield (d * day + i * 1000L, i < 2)
    val df = rows.toDF("us", "hit")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Experiment.sprtDecision(df, "ts", col("hit"),
      p0 = 0.2, p1 = 0.4).orderBy(col("day")).collect()
    assert(out.last.getAs[String]("decision") === "accept_h0")
  }

  test("bestBreakpoint: a clean two-slope series puts the best split " +
    "at the slope change and its SSE is ~0") {
    val day = 86400L * 1000000L
    // counts: days 0-5 flat at 4/day, days 6-11 ramp 8,12,16,20,24,28
    val counts = Seq(4, 4, 4, 4, 4, 4, 8, 12, 16, 20, 24, 28)
    val rows = counts.zipWithIndex.flatMap { case (n, d) =>
      (0 until n).map(i => d * day + i * 1000L)
    }
    val df = rows.toDF("us").withColumn("ts", timestamp_micros(col("us")))
    val out = TimeSeries.bestBreakpoint(df, "ts")
      .orderBy(col("day")).collect()
    // candidates: t in [2, n-2] = 12 - 3 = 9 rows
    assert(out.length === 9)
    val best = out.filter(_.getAs[Boolean]("is_best"))
    assert(best.length === 1)
    // splits after day 4 AND after day 5 both give two exactly-linear
    // segments (right side 4,8,12,... is collinear); SSE ties break to
    // the earliest day
    assert(best.head.getAs[Long]("day") === 4L)
    assert(math.abs(best.head.getAs[Double]("sse_total")) < 1e-9)
  }

  test("bestBreakpoint: exactly one best row even with SSE ties") {
    val day = 86400L * 1000000L
    // perfectly linear series: every split gives SSE 0; earliest wins
    val rows = (0 until 8).flatMap(d =>
      (0 until (2 + d)).map(i => d * day + i * 1000L))
    val df = rows.toDF("us").withColumn("ts", timestamp_micros(col("us")))
    val out = TimeSeries.bestBreakpoint(df, "ts").collect()
    assert(out.count(_.getAs[Boolean]("is_best")) === 1)
    assert(out.filter(_.getAs[Boolean]("is_best"))
      .head.getAs[Long]("day") === 1L)
  }

  test("ridgeLooInfluence: a group that fits the global line has ~zero " +
    "influence; an outlier group has visibly more") {
    val clean = (1 to 60).map { i =>
      val x1 = (i % 10).toDouble; val x2 = (i % 4).toDouble
      ("clean" + (i % 2), 1.0 + 2.0 * x1 + 3.0 * x2, x1, x2)
    }
    // outlier source: same x-range, shifted intercept
    val dirty = (1 to 20).map { i =>
      val x1 = (i % 10).toDouble; val x2 = (i % 4).toDouble
      ("dirty", 50.0 + 2.0 * x1 + 3.0 * x2, x1, x2)
    }
    val df = (clean ++ dirty).toDF("src", "y", "x1", "x2")
    val out = LinAlg.ridgeLooInfluence(df, "y", "x1", "x2",
      lambda = 0.0, groupCol = "src").collect()
    assert(out.length === 9) // 3 groups x 3 features
    // with "dirty" excluded the remaining data is EXACTLY linear, so
    // the LOO fit recovers the clean generating coefficients
    val dirtyLoo = out.filter(_.getString(0) == "dirty")
      .map(r => r.getAs[String]("feature") -> r.getAs[Double]("beta_loo"))
      .toMap
    assert(math.abs(dirtyLoo("intercept") - 1.0) < 1e-4)
    assert(math.abs(dirtyLoo("x1") - 2.0) < 1e-4)
    assert(math.abs(dirtyLoo("x2") - 3.0) < 1e-4)
    // while the full (contaminated) intercept sits far from 1
    val fullIntercept = out
      .filter(r => r.getAs[String]("feature") == "intercept")
      .head.getAs[Double]("beta_full")
    assert(math.abs(fullIntercept - 1.0) > 5.0)
  }

  test("ridgeLooInfluence: beta_full agrees with ridgeNormalEq") {
    val df = (1 to 50).map { i =>
      val x1 = i.toDouble; val x2 = (i % 7).toDouble
      ("g" + (i % 3), 2.0 + 3.0 * x1 - x2, x1, x2)
    }.toDF("src", "y", "x1", "x2")
    val full = LinAlg.ridgeNormalEq(df, "y", "x1", "x2", 5.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val loo = LinAlg.ridgeLooInfluence(df, "y", "x1", "x2", 5.0, "src")
      .select(col("feature"), col("beta_full")).distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(loo === full)
  }

  test("ipwAte: a null effect with balanced arms estimates ~0 and " +
    "keeps ESS near the arm sizes") {
    // treatment independent of outcome; x features uninformative
    val df = (1 to 400).map { i =>
      val t = i % 2
      (t, 10.0 + (i % 5).toDouble, (i % 3).toDouble, (i % 7).toDouble)
    }.toDF("t", "o", "x1", "x2")
    val out = Experiment.ipwAte(df,
      Seq(col("x1"), col("x2")), "t", "o", iters = 3, lr = 0.1)
      .collect().head
    assert(out.getAs[Long]("n") === 400L)
    assert(math.abs(out.getAs[Double]("ate_ipw")) < 0.5)
    // near-uniform weights: ESS close to 200 per arm
    assert(out.getAs[Double]("ess_treated") > 150)
    assert(out.getAs[Double]("ess_control") > 150)
  }

  test("ipwAte: recovers a constant additive effect under a covariate-" +
    "dependent (but overlapping) assignment") {
    // assignment depends on x1 deterministically ONLY through parity
    // mixing; outcome = 5 + 2*t + x1
    val df = (1 to 600).map { i =>
      val x1 = (i % 4).toDouble
      val t = if ((i + i / 4) % 2 == 0) 1 else 0
      (t, 5.0 + 2.0 * t + x1, x1, 1.0)
    }.toDF("t", "o", "x1", "x2")
    val out = Experiment.ipwAte(df,
      Seq(col("x1"), col("x2")), "t", "o", iters = 3, lr = 0.1)
      .collect().head
    assert(math.abs(out.getAs[Double]("ate_ipw") - 2.0) < 0.5)
  }

  test("ridgePath: SSE is non-decreasing and the slope norm " +
    "non-increasing along the lambda path; lambda 0 matches OLS") {
    val df = (1 to 80).map { i =>
      val x1 = (i % 9).toDouble; val x2 = (i % 5).toDouble
      (3.0 + 2.0 * x1 - 1.5 * x2 + (i % 3) * 0.1, x1, x2)
    }.toDF("y", "x1", "x2")
    val path = LinAlg.ridgePath(df, "y", "x1", "x2",
      Seq(0.0, 10.0, 1000.0, 100000.0))
      .orderBy(col("lambda")).collect()
    assert(path.length === 4)
    val sses = path.map(_.getAs[Double]("sse"))
    assert(sses.zip(sses.tail).forall { case (a, b) => b >= a })
    val norms = path.map(_.getAs[Double]("slope_l2"))
    assert(norms.zip(norms.tail).forall { case (a, b) => b <= a })
    // lambda = 0 equals the plain normal-equation fit
    val ols = LinAlg.ridgeNormalEq(df, "y", "x1", "x2", 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(path.head.getAs[Double]("beta_x1") === ols("x1"))
    assert(path.head.getAs[Double]("beta_x2") === ols("x2"))
  }

  test("hllSlidingDistinct: pane-merged estimate equals the one-shot " +
    "sketch of the same window's union (merge = max is lossless)") {
    val day = 86400L * 1000000L
    // 10 days; day d sees users d*37 .. d*37+79 (overlapping blocks)
    val rows = for { d <- 0 until 10; u <- 0 until 80 }
      yield (d * day + u * 1000L, (d * 37 + u).toLong)
    val df = rows.toDF("us", "user")
      .withColumn("ts", timestamp_micros(col("us")))
    val slid = Sketches.hllSlidingDistinct(df, "ts", "user", 7)
      .orderBy(col("day")).collect()
    assert(slid.length === 10)
    // one-shot sketch over the FULL trailing window of the last day
    // (days 3..9 => users 3*37 .. 9*37+79)
    val winRows = rows.filter(_._1 >= 3 * day)
    val winDf = winRows.toDF("us", "user").withColumn("g", lit(1))
    val oneShot = Sketches.hllDistinct(winDf, "g", "user").collect().head
    val last = slid.last
    assert(last.getAs[Double]("est") === oneShot.getAs[Double]("est"))
    assert(last.getAs[Long]("exact") === oneShot.getAs[Long]("exact"))
  }

  test("systematicPps: per-stratum copies total the target, heavy rows " +
    "get proportionally more, zero/negative weights are excluded") {
    val df = (
      (1 to 40).map(i => ("a", i.toLong, 1.0)) ++
        Seq(("a", 100L, 60.0)) ++ // one heavy row: 60% of stratum mass
        (1 to 30).map(i => ("b", i.toLong, 2.0)) ++
        Seq(("b", 99L, 0.0), ("b", 98L, -5.0))) // excluded
      .toDF("s", "id", "w")
    val out = Resample.systematicPps(df, "s", "id", "w", nPerStratum = 10)
      .collect()
    val byStratum = out.groupBy(_.getString(0))
    assert(byStratum("a").map(_.getAs[Long]("copies")).sum === 10L)
    assert(byStratum("b").map(_.getAs[Long]("copies")).sum === 10L)
    // heavy row: weight share 0.6 => 6 +- 1 copies
    val heavy = out.filter(r => r.getString(0) == "a" &&
      r.getAs[Long]("id") == 100L).head.getAs[Long]("copies")
    assert(heavy >= 5L && heavy <= 7L)
    assert(!out.exists(r => r.getString(0) == "b" &&
      (r.getAs[Long]("id") == 99L || r.getAs[Long]("id") == 98L)))
  }

  test("aipwAte: with correct outcome models the augmentation recovers " +
    "a constant effect even under covariate-shifted assignment") {
    // outcome exactly linear per arm: y = 1 + x0 + 2*x1 + 3*t
    val df = (1 to 600).map { i =>
      val x0 = (i % 5).toDouble; val x1 = (i % 3).toDouble
      val t = if ((i + i / 5) % 2 == 0) 1 else 0
      (t, 1.0 + x0 + 2.0 * x1 + 3.0 * t, x0, x1)
    }.toDF("t", "o", "x0", "x1")
    val out = Experiment.aipwAte(df,
      Seq(col("x0"), col("x1")), "t", "o", iters = 3, lr = 0.1)
      .collect().head
    assert(out.getAs[Long]("n") === 600L)
    // outcome models are exactly right => AIPW is exact up to snaps
    assert(math.abs(out.getAs[Double]("ate_aipw") - 3.0) < 1e-3)
    // and the model means differ by the effect
    assert(math.abs(out.getAs[Double]("mt_mean")
      - out.getAs[Double]("mc_mean") - 3.0) < 1e-3)
  }

  test("aipwAte: degenerate design (empty arm / constant feature) fails " +
    "fast instead of emitting NaN") {
    // every row treated -> control-arm normal equations are singular
    val oneArm = (1 to 50).map { i =>
      (1, i.toDouble, (i % 5).toDouble, (i % 3).toDouble)
    }.toDF("t", "o", "x0", "x1")
    val e1 = intercept[IllegalArgumentException] {
      Experiment.aipwAte(oneArm, Seq(col("x0"), col("x1")), "t", "o",
        iters = 2, lr = 0.1).collect()
    }
    assert(e1.getMessage.contains("singular"))
    // constant x1 -> collinear with the intercept in both arms
    val collinear = (1 to 50).map { i =>
      (i % 2, i.toDouble, (i % 5).toDouble, 7.0)
    }.toDF("t", "o", "x0", "x1")
    val e2 = intercept[IllegalArgumentException] {
      Experiment.aipwAte(collinear, Seq(col("x0"), col("x1")), "t", "o",
        iters = 2, lr = 0.1).collect()
    }
    assert(e2.getMessage.contains("singular"))
  }

  test("aipwAte: balanced null effect estimates ~0") {
    // x1 must NOT equal t (i % 2) — that fixture made the treated-arm
    // normal equations singular, and before the det guard the resulting
    // NaN chain summed to a NULL that unboxed to 0.0, silently passing
    val df = (1 to 400).map { i =>
      val x0 = (i % 7).toDouble; val x1 = (i % 3).toDouble
      (i % 2, 5.0 + x0 - x1, x0, x1)
    }.toDF("t", "o", "x0", "x1")
    val out = Experiment.aipwAte(df,
      Seq(col("x0"), col("x1")), "t", "o", iters = 3, lr = 0.1)
      .collect().head
    assert(math.abs(out.getAs[Double]("ate_aipw")) < 0.05)
  }

  test("permutationTest: a huge real effect is more extreme than every " +
    "hash reassignment; a null effect is not") {
    val big = (1 to 300).map(i =>
      (i.toLong, if (i % 2 == 0) 100.0 + (i % 7) else (i % 7).toDouble,
        i % 2 == 0)).toDF("id", "v", "treated")
    val rBig = Experiment.permutationTest(big, "id", "v",
      col("treated"), reps = 99).collect().head
    assert(rBig.getAs[Long]("b_reps") === 99L)
    assert(rBig.getAs[Long]("n_extreme") === 0L)
    assert(rBig.getAs[Double]("p_value") === 0.01)
    val none = (1 to 300).map(i =>
      (i.toLong, (i % 7).toDouble, i % 2 == 0)).toDF("id", "v", "treated")
    val rNone = Experiment.permutationTest(none, "id", "v",
      col("treated"), reps = 99).collect().head
    assert(rNone.getAs[Double]("p_value") > 0.1)
  }

  test("cmhOddsRatio: homogeneous 2x2 strata pool to the common odds " +
    "ratio") {
    // two strata, each with a = 40, b = 10, c = 20, d = 30:
    // per-stratum OR = (40*30)/(10*20) = 6; CMH must also be 6
    val rows = for {
      s <- Seq("u", "w")
      (x, y, n) <- Seq((true, true, 40), (true, false, 10),
        (false, true, 20), (false, false, 30))
      _ <- 1 to n
    } yield (s, x, y)
    val df = rows.toDF("s", "x", "y")
    val r = Experiment.cmhOddsRatio(df, col("s"), col("x"), col("y"))
      .collect().head
    assert(r.getAs[Long]("k_strata") === 2L)
    assert(math.abs(r.getAs[Double]("or_cmh") - 6.0) < 1e-9)
  }

  test("wilcoxonSignedRank: replays the hand-computed statistic with " +
    "average ranks and drops zero differences") {
    // diffs: 1, -2, 3, -4, 5, 0 (dropped), plus a tie pair |d|=3
    val df = Seq(1.0, -2.0, 3.0, -4.0, 5.0, 0.0, -3.0).toDF("diff")
    val r = graft.operators.RankStats.wilcoxonSignedRank(df, "diff")
      .collect().head
    assert(r.getAs[Long]("n_pairs") === 6L)
    // |d| sorted: 1,2,3,3,4,5 -> ranks 1,2,3.5,3.5,5,6
    // positive d: 1 (r1), 3 (r3.5), 5 (r6) => W+ = 10.5
    assert(r.getAs[Double]("w_plus") === 10.5)
    // mean = 6*7/4 = 10.5 => z numerator 0 => z = 0
    assert(math.abs(r.getAs[Double]("z")) < 1e-12)
  }

  test("cohensKappa: perfect agreement gives kappa 1; independence " +
    "gives ~0") {
    val perfect = (1 to 100).map(i => (i % 2 == 0, i % 2 == 0))
      .toDF("r1", "r2")
    val p = graft.operators.RankStats.cohensKappa(
      perfect, col("r1"), col("r2")).collect().head
    assert(p.getAs[Double]("kappa") > 0.999999)
    val indep = (1 to 100).map(i => (i % 2 == 0, i % 4 < 2))
      .toDF("r1", "r2")
    val q = graft.operators.RankStats.cohensKappa(
      indep, col("r1"), col("r2")).collect().head
    assert(math.abs(q.getAs[Double]("kappa")) < 0.05)
  }

  test("lorenzCurve: perfect equality lies on the diagonal; " +
    "concentration bows below it; the last point is (1, 1)") {
    val equal = (1 to 100).map(_ => 5.0).toDF("v")
    val eq = graft.operators.Inequality.lorenzCurve(equal, "v")
      .orderBy(col("decile")).collect()
    assert(eq.length === 10)
    eq.foreach { r =>
      assert(math.abs(r.getAs[Double]("pop_share")
        - r.getAs[Double]("value_share")) < 1e-9)
    }
    // one row holds 91% of the mass
    val skewed = ((1 to 99).map(_ => 1.0) ++ Seq(991.0)).toDF("v")
    val sk = graft.operators.Inequality.lorenzCurve(skewed, "v")
      .orderBy(col("decile")).collect()
    val last = sk.last
    assert(last.getAs[Double]("pop_share") === 1.0)
    assert(last.getAs[Double]("value_share") === 1.0)
    // at the 90th percentile the bottom 90% hold only 90/1090 ≈ 8.3%
    val d9 = sk(8)
    assert(d9.getAs[Double]("value_share") < 0.1)
  }

  test("herfindahl: monopoly scores 1, equal n-way split scores 1/n") {
    val df = Seq(
      ("mono", 1L, 100.0),
      ("quad", 1L, 25.0), ("quad", 2L, 25.0),
      ("quad", 3L, 12.5), ("quad", 3L, 12.5), ("quad", 4L, 25.0))
      .toDF("m", "i", "v")
    val out = graft.operators.Inequality.herfindahl(df, "m", "i", "v")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_members"), r.getAs[Double]("hhi"))).toMap
    assert(out("mono")._1 === 1L)
    assert(math.abs(out("mono")._2 - 1.0) < 1e-9)
    assert(out("quad")._1 === 4L)
    assert(math.abs(out("quad")._2 - 0.25) < 1e-9)
  }

  test("countMin: estimates upper-bound true counts; halves merge by sum") {
    import spark.implicits._
    val items = (1 to 200).flatMap(i => Seq.fill(i % 7 + 1)(s"k${i % 31}"))
    val df = items.toDF("item")
    val sketch = Sketches.countMinBuild(df, "item", d = 4, w = 16)
    assert(sketch.count() <= 4L * 16)
    val truth = df.groupBy($"item").count()
    val est = Sketches.countMinEstimate(sketch, truth, "item", d = 4, w = 16)
      .join(truth, Seq("item")).collect()
    est.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("count"),
        s"CMS under-counted ${r.getString(0)}")
    }
    // linear sketch: sum of the halves' cells == the full sketch
    val (h1, h2) = (items.take(100), items.drop(100))
    val merged = Sketches.countMinBuild(h1.toDF("item"), "item", 4, 16)
      .unionByName(Sketches.countMinBuild(h2.toDF("item"), "item", 4, 16))
      .groupBy($"row", $"bucket").agg(org.apache.spark.sql.functions.sum($"c").as("c"))
    val diff = merged.except(sketch).count() + sketch.except(merged).count()
    assert(diff === 0L)
    // an unseen probe estimates 0 when its cells are empty, never null
    val unseen = Sketches.countMinEstimate(
      sketch, Seq("nope").toDF("item"), "item", 4, 16).head
    assert(!unseen.isNullAt(1))
  }

  test("histogramQuantiles: interpolated estimate, exact audit, degenerate group") {
    import spark.implicits._
    val df = ((1 to 100).map(v => ("u", v.toDouble)) ++
      Seq.fill(5)(("const", 7.0))).toDF("g", "v")
    val out = Sketches.histogramQuantiles(df, "g", "v", bins = 10, qs = Seq(0.5))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("est"), r.getAs[Double]("exact"))).toMap
    // uniform 1..100, k = 50: exact rank-50 value is 50; interp lands at
    // 1 + 9.9 * (4 + (50-40)/10) = 50.5
    assert(out("u")._1 === 100L)
    assert(out("u")._3 === 50.0)
    assert(math.abs(out("u")._2 - 50.5) < 1e-9)
    // degenerate group: est == exact == the constant
    assert(out("const") === ((5L, 7.0, 7.0)))
  }

  test("madOutliers: lower medians, k*mad flagging, degenerate group") {
    import spark.implicits._
    import graft.operators.RankStats
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("a", _)) ++
      Seq.fill(4)(("b", 5.0))).toDF("g", "v")
    val out = RankStats.madOutliers(df, "g", "v", k = 3.0)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("median"),
          r.getAs[Double]("mad"), r.getAs[Long]("n_outliers"))).toMap
    // a: lower median = 3, devs sorted [0,1,1,2,97] -> mad 1, only 97 > 3
    assert(out("a") === ((5L, 3.0, 1.0, 1L)))
    // b: constant group -> mad 0, zero deviations flag nothing
    assert(out("b") === ((4L, 5.0, 0.0, 0L)))
  }

  test("countMinSlidingCounts: trailing sums slide; est >= exact") {
    import spark.implicits._
    def ts(day: Int, i: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-${day + 1}%02d 00:00:${i % 60}%02d")
    // u: 2 events day0, 3 events day2; v: 1 event each day
    val rows = (1 to 2).map(i => (ts(0, i), "u")) ++
      (1 to 3).map(i => (ts(2, i), "u")) ++
      (0 to 2).map(d => (ts(d, 40), "v"))
    val df = rows.toDF("ts", "user")
    val out = Sketches.countMinSlidingCounts(df, "ts", "user",
      windowDays = 2, d = 4, w = 64, topProbes = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getAs[Long]("cms_est"), r.getAs[Long]("exact"))).toMap
    val d0 = out.keys.map(_._1).min
    assert(out((d0, "u"))._2 === 2L)      // day0 window: 2
    assert(out((d0 + 1, "u"))._2 === 2L)  // day0-1: still 2
    assert(out((d0 + 2, "u"))._2 === 3L)  // day1-2: the 3 new only
    assert(out((d0 + 1, "v"))._2 === 2L)
    out.values.foreach { case (est, exact) => assert(est >= exact) }
  }
}

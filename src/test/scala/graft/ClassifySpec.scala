package graft

import org.apache.spark.sql.functions._

import graft.operators.{Classify, HeavyHitters, TimeSeries}

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  test("naiveBayes: separable two-class vocabulary classifies by class " +
    "tokens; ties break to the lexicographically smaller class") {
    val df = Seq(
      (1L, "cat cat purr", "A"),
      (2L, "cat purr purr", "A"),
      (3L, "dog bark bark", "B"),
      (4L, "dog dog bark", "B"))
      .toDF("doc_id", "text", "cls")
    val out = Classify.naiveBayes(df, "text", "doc_id", "cls")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "A", 2L -> "A", 3L -> "B", 4L -> "B"))
  }

  test("naiveBayes: scores are finite and one row per document") {
    val df = Seq(
      (1L, "x y z", "A"), (2L, "x y", "A"), (3L, "z z q", "B"))
      .toDF("doc_id", "text", "cls")
    val rows = Classify.naiveBayes(df, "text", "doc_id", "cls").collect()
    assert(rows.length === 3)
    assert(rows.forall(r => !r.getAs[Double]("score").isNaN))
  }

  test("logisticGd: gradient of the first round matches the closed form " +
    "(sigma(0)=0.5) and weights move toward the separating sign") {
    // y=1 at x=+1, y=0 at x=-1: after any rounds w_0 must be positive
    val df = Seq((1.0, 1.0), (1.0, 1.0), (0.0, -1.0), (0.0, -1.0))
      .toDF("y", "x")
    val r1 = Classify.logisticGd(df, Seq(col("x")), "y", iters = 1, lr = 0.1)
      .collect().head
    // round 1: err = 0.5 - y -> g_b = mean(0.5-y) = 0, g_w = mean((0.5-y)x) = -0.5
    assert(r1.getAs[Double]("w_intercept") === 0.0)
    assert(math.abs(r1.getAs[Double]("w_0") - 0.05) < 1e-9)
    val r3 = Classify.logisticGd(df, Seq(col("x")), "y", iters = 3, lr = 0.1)
      .collect().head
    assert(r3.getAs[Double]("w_0") > r1.getAs[Double]("w_0"))
  }

  test("decisionStump: finds the clean split and reports zero impurity") {
    // label=1 iff v >= 10; best split at the largest v below 10
    val df = Seq(1.0 -> 0, 2.0 -> 0, 3.0 -> 0, 10.0 -> 1, 11.0 -> 1)
      .toDF("v", "y")
    val r = Classify.decisionStump(df, "v", col("y") === 1).collect().head
    assert(r.getAs[Double]("threshold") === 3.0)
    assert(r.getAs[Long]("n_left") === 3L)
    assert(r.getAs[Long]("n_right") === 2L)
    assert(r.getAs[Long]("pos_left") === 0L)
    assert(r.getAs[Long]("pos_right") === 2L)
    assert(r.getAs[Double]("gini_after") === 0.0)
  }

  test("decisionStump: duplicate feature values aggregate before the split " +
    "search and the impurity is the weighted Gini") {
    // v=1: 2 rows (1 pos), v=2: 2 rows (2 pos). Split at 1:
    // left gini = 0.5 (1/2 pos), right = 0 -> weighted = 0.25
    val df = Seq((1.0, 1), (1.0, 0), (2.0, 1), (2.0, 1)).toDF("v", "y")
    val r = Classify.decisionStump(df, "v", col("y") === 1).collect().head
    assert(r.getAs[Double]("threshold") === 1.0)
    assert(math.abs(r.getAs[Double]("gini_after") - 0.25) < 1e-9)
  }

  test("fdViolations: an exact FD scores 0, a broken one scores its " +
    "minority fraction") {
    val df = Seq(
      (1, "x", "p"), (1, "x", "p"), (2, "y", "p"), (2, "z", "q"))
      .toDF("k", "dep1", "dep2")
    val out = Classify.fdViolations(df, Seq("k" -> "dep1", "k" -> "dep2"))
      .collect().map(r => r.getString(1) -> r.getAs[Double]("violation_rate"))
      .toMap
    // k=1 -> dep1 always x; k=2 -> y/z split: 1 of 4 rows must change
    assert(out("dep1") === 0.25)
    // dep2: k=1 -> p,p ; k=2 -> p,q -> also 1 of 4
    assert(out("dep2") === 0.25)
  }

  test("acf: a constant series has zero deviations (NaN acf guarded by " +
    "denominator 0 is not emitted here - use alternating series instead)") {
    // alternating daily counts: acf(1) = -1 for a perfectly alternating
    // mean-centered series (up to the lost first term)
    val day = 86400L * 1000000L
    val rows = (0 until 10).flatMap { d =>
      val n = if (d % 2 == 0) 2 else 4
      (0 until n).map(i => ("k", new java.sql.Timestamp((d * day + i) / 1000)))
    }
    val df = rows.toDF("k", "ts")
    val out = TimeSeries.acf(df, "k", "ts", 2)
      .collect().map(r => r.getInt(1) -> r.getAs[Double]("acf")).toMap
    assert(out(1) < -0.8) // strongly negative at lag 1
    assert(out(2) > 0.6) // strongly positive at lag 2
    val nDays = TimeSeries.acf(df, "k", "ts", 2)
      .collect().head.getAs[Long]("n_days")
    assert(nDays === 10L)
  }

  test("cmsAudit: estimates never undercount, and a wide sketch with few " +
    "keys is exact") {
    val df = (1 to 50).flatMap(i => Seq.fill(i % 5 + 1)(s"k$i"))
      .toDF("k")
    val wide = HeavyHitters.cmsAudit(df, "k", 3, 4096).collect()
    assert(wide.forall(r => r.getAs[Long]("overestimate") === 0L))
    val narrow = HeavyHitters.cmsAudit(df, "k", 2, 4).collect()
    assert(narrow.forall(r =>
      r.getAs[Long]("cms_estimate") >= r.getAs[Long]("exact")))
    assert(narrow.exists(r => r.getAs[Long]("overestimate") > 0L))
  }

  test("kmvDistinctAudit: below-k groups report exact counts; large " +
    "groups estimate within a plausible band") {
    import graft.operators.HeavyHitters
    val small = (1 to 5).map(i => ("s", s"u$i"))
    val big = (1 to 2000).map(i => ("b", s"v$i"))
    val df = (small ++ big).toDF("g", "u")
    val out = HeavyHitters.kmvDistinctAudit(df, "g", "u", 32)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("exact_distinct"), r.getAs[Double]("kmv_estimate")))
      .toMap
    assert(out("s") === ((5L, 5.0)))
    val (exact, est) = out("b")
    assert(exact === 2000L)
    assert(est > 1000.0 && est < 4000.0) // k=32 ~ 18% rel sd
  }

  test("decomposeDaily: a perfectly weekly-periodic series yields zero " +
    "residuals where the trend is defined") {
    val day = 86400L * 1000000L
    // counts cycle 1..7 by day-of-week over 21 days: MA7 constant 4,
    // seasonal absorbs the cycle, residuals 0
    val rows = (0 until 21).flatMap { d =>
      val n = (d % 7) + 1
      (0 until n).map(i => ("k", new java.sql.Timestamp((d * day + i) / 1000)))
    }
    val out = TimeSeries.decomposeDaily(rows.toDF("k", "ts"), "k", "ts")
      .collect()
    val defined = out.filter(r => !r.isNullAt(3))
    assert(defined.length === 15) // days 3..17 have full +-3 windows
    assert(defined.forall(r => r.getAs[Double]("trend") === 4.0))
    assert(defined.forall(r =>
      math.abs(r.getAs[Double]("residual")) < 1e-8))
    // seasonal means sum to ~zero across the week
    val seas = defined.map(r => r.getAs[Double]("seasonal")).distinct
    assert(math.abs(seas.sum) < 1e-6)
  }

  test("tClosenessAudit: a class matching the global distribution scores " +
    "0; a fully-skewed class scores 1 - p_global") {
    import graft.operators.Privacy
    // global: A and B equally likely. class g1 mirrors it; g2 is all-A
    val df = Seq(
      ("g1", "A"), ("g1", "B"), ("g1", "A"), ("g1", "B"),
      ("g2", "A"), ("g2", "A"), ("g2", "B"), ("g2", "B"),
      ("g3", "A"), ("g3", "A"), ("g3", "A"), ("g3", "A"))
      .toDF("q", "s")
    val out = Privacy.tClosenessAudit(df, Seq("q"), "s", 0.3)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("tvd"), r.getAs[Boolean]("t_violation"))).toMap
    // global p(A) = 2/3, p(B) = 1/3
    // g1, g2 are (.5, .5): tvd = .5(1/6 + 1/6) = 1/6 -> no violation
    assert(math.abs(out("g1")._1 - 1.0 / 6) < 1e-9)
    assert(math.abs(out("g2")._1 - 1.0 / 6) < 1e-9)
    assert(!out("g1")._2 && !out("g2")._2)
    // g3 is all-A: tvd = .5(1/3 + 1/3) = 1/3 > 0.3 -> violation
    assert(math.abs(out("g3")._1 - 1.0 / 3) < 1e-9)
    assert(out("g3")._2)
  }

  test("simplifiedSilhouette: tight well-separated clusters score near 1; " +
    "a point on the wrong side goes negative") {
    import graft.operators.Similarity
    val rows = Seq(
      (1L, Array(0.0f, 0.0f), 0), (2L, Array(0.1f, 0.0f), 0),
      (3L, Array(0.0f, 0.1f), 0),
      (4L, Array(10.0f, 10.0f), 1), (5L, Array(10.1f, 10.0f), 1),
      (99L, Array(10.0f, 10.1f), 0)) // labeled 0 but sits in cluster 1
    val out = Similarity.simplifiedSilhouette(
      rows.toDF("vec_id", "embedding", "label"), "vec_id", "embedding",
      "label").collect().map(r => r.getInt(0) ->
        (r.getAs[Double]("mean_silhouette"), r.getAs[Long]("n_negative")))
      .toMap
    assert(out(1)._1 > 0.8)
    assert(out(0)._2 >= 1L) // the planted point is negative
  }

  test("rendezvousShards: every key routes to exactly one node, removing " +
    "a node only moves that node's keys") {
    import graft.operators.ScaleAudit
    val df = (1 to 400).map(i => s"k$i").toDF("k")
    val four = ScaleAudit.rendezvousShards(df, "k",
      Seq("a", "b", "c", "d")).collect()
    assert(four.map(_.getAs[Long]("n_keys")).sum === 400L)
    assert(four.forall(_.getAs[Double]("key_balance") > 0.5))
    // drop node d: keys on a/b/c must NOT move (minimal-disruption law)
    val withD = df.withColumn("__best", greatest(
      Seq("a", "b", "c", "d").map(n => struct(
        graft.functions.TextFunctions.md5Hash60(
          concat(lit(n + ":"), col("k"))).as("w"),
        lit(n).as("node"))): _*)).select(col("k"), col("__best.node"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val withoutD = df.withColumn("__best", greatest(
      Seq("a", "b", "c").map(n => struct(
        graft.functions.TextFunctions.md5Hash60(
          concat(lit(n + ":"), col("k"))).as("w"),
        lit(n).as("node"))): _*)).select(col("k"), col("__best.node"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val moved = withD.filter { case (k, n) => withoutD(k) != n }
    assert(moved.forall { case (_, n) => n == "d" })
  }

  test("lshNdcgAtK: an index whose candidates cover the corpus scores " +
    "ndcg exactly 1 for every query") {
    import graft.operators.Similarity
    // near-identical vectors: all sign sketches match, every band
    // collides, the approx ranking IS the exact ranking
    val vecs = (1L to 6L).map(i =>
      (i, Array(1.0f, 0.5f, 0.25f, 0.125f + i.toFloat * 1e-4f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.lshNdcgAtK(vecs, vecs.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 3, numBits = 4, bands = 4, dim = 4)
      .collect()
    assert(out.length === 2)
    assert(out.forall(r => r.getAs[Double]("ndcg") === 1.0))
    assert(out.forall(r => r.getAs[Long]("n_exact") === 3L))
  }

  test("ebShrinkRates: low-volume entities shrink toward the prior mean, " +
    "high-volume entities barely move") {
    import graft.operators.Encoding
    // population: many entities at rate ~0.5 define the prior; entity
    // "lo" has 1/1 (rate 1), entity "hi" has 100/200 (rate .5)
    val bg = (1 to 40).flatMap { i =>
      (1 to 10).map(j => (s"e$i", if (j <= (if (i % 2 == 0) 4 else 6)) 1 else 0))
    }
    val rows = bg ++ Seq(("lo", 1)) ++
      (1 to 200).map(j => ("hi", if (j <= 100) 1 else 0))
    val df = rows.toDF("k", "conv")
    val out = Encoding.ebShrinkRates(df, "k", col("conv") === 1)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("rate"), r.getAs[Double]("shrunk_rate"))).toMap
    val (loRate, loShrunk) = out("lo")
    val (hiRate, hiShrunk) = out("hi")
    assert(loRate === 1.0)
    assert(loShrunk < 0.9) // pulled hard toward ~0.5
    assert(math.abs(hiShrunk - hiRate) < 0.05) // volume resists the prior
  }

  test("ebShrinkRates: degenerate variance (all rates equal) passes raw " +
    "rates through with alpha = beta = 0") {
    import graft.operators.Encoding
    val df = (1 to 5).flatMap(i => Seq((s"e$i", 1), (s"e$i", 0)))
      .toDF("k", "conv")
    val out = Encoding.ebShrinkRates(df, "k", col("conv") === 1).collect()
    assert(out.forall(_.getAs[Double]("alpha") === 0.0))
    assert(out.forall(r =>
      r.getAs[Double]("shrunk_rate") === r.getAs[Double]("rate")))
  }

  test("sentenceStats: segments on terminal runs, drops empties, counts " +
    "words per sentence") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "one two. three four five! six?"),
      (2L, "just one sentence"),
      (3L, "trailing dots...")).toDF("doc_id", "text")
    val out = TextAnalysis.sentenceStats(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_sentences"), r.getAs[Long]("n_words"),
          r.getAs[Long]("max_sentence_words"))).toMap
    assert(out(1L) === ((3L, 6L, 3L)))
    assert(out(2L) === ((1L, 3L, 3L)))
    assert(out(3L) === ((1L, 2L, 2L)))
  }

  test("sortednessAudit: a sorted key scores zero descents and one full " +
    "run; a reversed key scores all descents") {
    import graft.operators.ScaleAudit
    val rows = (1 to 10).map(i => ("asc", i.toLong, i, i.toDouble)) ++
      (1 to 10).map(i => ("desc", i.toLong, i, (11 - i).toDouble))
    val df = rows.toDF("k", "o", "tie", "v")
    val out = ScaleAudit.sortednessAudit(df, "k", "o", "tie", "v")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_descents"), r.getAs[Double]("descent_frac"),
          r.getAs[Long]("longest_run"))).toMap
    assert(out("asc") === ((0L, 0.0, 10L)))
    assert(out("desc")._1 === 9L)
    assert(out("desc")._2 === 1.0)
    assert(out("desc")._3 === 1L)
  }

  test("fleschReadingEase: hand-checked score on a known sentence and " +
    "monotone degradation with clause walls") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "the cat sat."), // 1 sentence, 3 words, 3 vowel groups
      (2L, "a a a a a a a a a a a a a a a a a a a a a a a a a a a a a a"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.fleschReadingEase(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("flesch")).toMap
    // doc 1: 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert(math.abs(out(1L) - (206.835 - 1.015 * 3 - 84.6)) < 1e-5)
    // doc 2: one 30-word "sentence" -> words/sentences dominates
    assert(out(2L) < out(1L))
  }

  test("naiveBayesTopFeatures: class-exclusive tokens rank first with " +
    "positive log-odds") {
    val df = Seq(
      ("A", "alpha alpha shared"), ("A", "alpha shared"),
      ("B", "beta beta shared"), ("B", "beta shared"))
      .toDF("cls", "text")
    val out = Classify.naiveBayesTopFeatures(df, "text", "cls", k = 2)
      .collect()
    val top = out.filter(_.getAs[Long]("rank") == 1L)
      .map(r => r.getString(0) -> r.getAs[String]("term")).toMap
    assert(top === Map("A" -> "alpha", "B" -> "beta"))
    assert(out.filter(r => Set("alpha", "beta")(r.getAs[String]("term")))
      .forall(_.getAs[Double]("log_odds") > 0.0))
  }

  test("binaryFile ingestion: fingerprints round-trip bytes exactly, " +
    "including multi-byte UTF-8") {
    import graft.sources.BinaryFiles
    val dir = java.nio.file.Files.createTempDirectory("binspec").toString
    BinaryFiles.writeTextFiles(
      Seq(("a.txt", "hello"), ("b.txt", "héllo")), dir)
    val out = BinaryFiles.fingerprints(BinaryFiles.readDir(spark, dir))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("length"), r.getString(2))).toMap
    assert(out("a.txt")._1 === 5L)
    assert(out("b.txt")._1 === 6L) // é is two bytes
    assert(out("a.txt")._2 ===
      java.security.MessageDigest.getInstance("MD5")
        .digest("hello".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
  }

  test("alsRank1: hand-checked half-steps (unit init -> item means -> " +
    "user ratios) and duplicate cells average first") {
    val df = Seq(
      ("a", "x", 10.0), ("a", "y", 20.0), ("b", "x", 30.0),
      ("b", "x", 30.0)) // duplicate cell collapses to its mean
      .toDF("u", "i", "v")
    val out = Classify.alsRank1(df, "u", "i", "v").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("u_factor"), r.getAs[Long]("n_items"))).toMap
    // v_x = mean(10, 30) = 20, v_y = 20
    // u_a = (20*10 + 20*20)/(400 + 400) = 0.75 ; u_b = 20*30/400 = 1.5
    assert(math.abs(out("a")._1 - 0.75) < 1e-8)
    assert(math.abs(out("b")._1 - 1.5) < 1e-8)
    assert(out("a")._2 === 2L && out("b")._2 === 1L)
  }

  test("boostedStumps: a clean step function is fit exactly in one round " +
    "and round 2 sees near-zero residuals") {
    // y = 10 for x<=2, y = 20 for x>=3
    val df = Seq((1.0, 10.0), (2.0, 10.0), (3.0, 20.0), (4.0, 20.0))
      .toDF("x", "y")
    val rows = Classify.boostedStumps(df, "x", "y", rounds = 2,
      shrinkage = 1.0).collect()
    val r1 = rows.find(_.getInt(0) == 1).get
    assert(r1.getAs[Double]("threshold") === 2.0)
    assert(r1.getAs[Double]("left_value") === -5.0) // mean 15, resid -5/+5
    assert(r1.getAs[Double]("right_value") === 5.0)
    assert(r1.getAs[Long]("n_left") === 2L)
    val r2 = rows.find(_.getInt(0) == 2).get
    assert(math.abs(r2.getAs[Double]("left_value")) < 1e-9)
    assert(math.abs(r2.getAs[Double]("right_value")) < 1e-9)
    assert(r1.getAs[Double]("gain") > r2.getAs[Double]("gain"))
  }

  test("neymanSample: allocation follows N_h*S_h, zero-variance strata " +
    "get zero budget, and alloc never exceeds the stratum size") {
    import graft.operators.Mixture
    // stratum a: 100 rows, sd 0 (constant); stratum b: 100 rows, high sd
    val rows = (1 to 100).map(i => ("a", i.toLong, 5.0)) ++
      (1 to 100).map(i => ("b", 100L + i, if (i % 2 == 0) 0.0 else 10.0))
    val df = rows.toDF("s", "id", "v")
    val out = Mixture.neymanSample(df, "s", "v", "id", 50)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("alloc") === 0L)
    assert(out("b").getAs[Long]("alloc") === 50L)
    assert(out("a").getAs[Double]("sd") === 0.0)
    // tiny budget larger than a stratum: capped at n_h
    val out2 = Mixture.neymanSample(df.where(col("s") === "b"),
      "s", "v", "id", 500).collect().head
    assert(out2.getAs[Long]("alloc") === 100L)
  }

  test("neymanSample: membership is deterministic - same input, same " +
    "sample mean") {
    import graft.operators.Mixture
    val df = (1 to 60).map(i => (s"s${i % 3}", i.toLong, i * 1.5))
      .toDF("s", "id", "v")
    val a = Mixture.neymanSample(df, "s", "v", "id", 30)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("sample_mean"))
    val b = Mixture.neymanSample(df, "s", "v", "id", 30)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("sample_mean"))
    assert(a.toMap === b.toMap)
  }

  test("saveWeights/loadWeights: a fitted logistic weight row " +
    "round-trips parquet bit-exactly and scores identically") {
    val df = Seq((0.0, 1.0, 1), (1.0, 0.5, 0), (2.0, 0.1, 1),
      (3.0, 0.9, 0)).toDF("x0", "x1", "y")
    val w = Classify.logisticGd(df, Seq(col("x0"), col("x1")), "y",
      iters = 3, lr = 0.1)
    val path = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_spec_clf_weights")
      .getAbsolutePath
    Classify.saveWeights(w, path)
    val loaded = Classify.loadWeights(spark, path)
    assert(loaded.columns.sorted === w.columns.sorted)
    val a = w.collect().head
    val b = loaded.select(w.columns.map(col): _*).collect().head
    // doubles round-trip parquet bit-exactly — compare raw bits
    w.columns.zipWithIndex.foreach { case (c, i) =>
      if (c != "iters")
        assert(java.lang.Double.doubleToLongBits(a.getDouble(i)) ===
          java.lang.Double.doubleToLongBits(b.getDouble(i)), c)
    }
    val score = (frame: org.apache.spark.sql.DataFrame) =>
      df.crossJoin(broadcast(frame))
        .select(round(lit(1.0) / (lit(1.0) + exp(-(col("w_intercept")
          + col("w_0") * col("x0") + col("w_1") * col("x1")))), 10))
        .collect().map(_.getDouble(0)).toSeq
    assert(score(w) === score(loaded))
  }

  test("boostedStumps: shrinkage halves the correction carried into the " +
    "next round's residuals") {
    val df = Seq((1.0, 10.0), (2.0, 10.0), (3.0, 20.0), (4.0, 20.0))
      .toDF("x", "y")
    val rows = Classify.boostedStumps(df, "x", "y", rounds = 2,
      shrinkage = 0.5).collect()
    val r2 = rows.find(_.getInt(0) == 2).get
    // after a 0.5-shrunk perfect stump, residuals are half the original
    assert(math.abs(r2.getAs[Double]("left_value") + 2.5) < 1e-9)
    assert(math.abs(r2.getAs[Double]("right_value") - 2.5) < 1e-9)
  }
}

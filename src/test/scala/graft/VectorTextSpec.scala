package graft

import org.apache.spark.sql.functions._

import graft.operators.{Collocations, LinAlg, TimeSeries}

/** Unit specs for the round-7 additions: collocation PMI, token
  * entropy, Gram/covariance matrices, walk-forward folds. Literal
  * fixtures with hand-computed expectations.
  */
class VectorTextSpec extends SparkSpec {
  import spark.implicits._

  test("adjacentPairsPmi counts bigrams and computes PMI exactly") {
    val df = Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, "c")).toDF("id", "text")
    val out = Collocations.adjacentPairsPmi(df, "text", 2L)
      .orderBy("w1", "w2").collect()
    // bigrams: (a,b)x3, (b,a)x1, (b,c)x1 -> only (a,b) survives minCount=2
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 3L) // n_pair
    assert(r.getLong(3) == 3L && r.getLong(4) == 3L) // n_w1, n_w2
    // total tokens = 8; pmi = ln(3*8/(3*3))
    val expected = BigDecimal(math.log(3.0 * 8 / 9))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(5) == expected)
  }

  test("tokenEntropy: uniform doc hits ln(k), repeated doc hits 0") {
    val df = Seq(
      (1L, "a b c d"),   // uniform over 4 -> H = ln 4, norm = 1
      (2L, "a a a a"),   // single word -> H = 0, norm null (ln 1 = 0)
      (3L, "a a b")).toDF("doc_id", "text")
    val out = Collocations.tokenEntropy(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(math.abs(out(0).getDouble(3) - math.log(4.0)) < 1e-9)
    assert(math.abs(out(0).getDouble(4) - 1.0) < 1e-9)
    assert(out(1).getDouble(3) == 0.0)
    assert(out(1).isNullAt(4))
    val h3 = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(out(2).getDouble(3) - h3) < 1e-9)
    assert(out(2).getLong(1) == 3L && out(2).getLong(2) == 2L)
  }

  test("gramMatrix matches hand-computed X'X on a tiny matrix") {
    val df = Seq(
      Tuple1(Array(1.0f, 2.0f, 3.0f)),
      Tuple1(Array(0.5f, -1.0f, 0.0f))).toDF("embedding")
    val out = LinAlg.gramMatrix(df, "embedding", 3)
      .orderBy("i", "j").collect()
    assert(out.length == 6) // upper triangle of 3x3
    val m = out.map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(m((0, 0)) == 1.0 + 0.25)
    assert(m((0, 1)) == 2.0 - 0.5)
    assert(m((0, 2)) == 3.0)
    assert(m((1, 1)) == 4.0 + 1.0)
    assert(m((1, 2)) == 6.0)
    assert(m((2, 2)) == 9.0)
  }

  test("covarianceMatrix matches the population covariance") {
    val df = Seq(
      Tuple1(Array(1.0f, 10.0f)),
      Tuple1(Array(3.0f, 14.0f))).toDF("embedding")
    val out = LinAlg.covarianceMatrix(df, "embedding", 2)
      .orderBy("i", "j").collect()
    val m = out.map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    // means (2, 12); cov00 = var(1,3) = 1; cov11 = var(10,14) = 4; cov01 = 2
    assert(m((0, 0)) == 1.0)
    assert(m((0, 1)) == 2.0)
    assert(m((1, 1)) == 4.0)
  }

  test("meanVector is the exact per-dimension mean") {
    val df = Seq(
      Tuple1(Array(1.0f, -2.0f)),
      Tuple1(Array(2.0f, -4.0f))).toDF("embedding")
    val out = LinAlg.meanVector(df, "embedding", 2).orderBy("i").collect()
    assert(out(0).getDouble(1) == 1.5 && out(1).getDouble(1) == -3.0)
  }

  test("walkForwardFolds: contiguous test buckets, cumulative train") {
    // 10 days, 2 events on day d for d in 0..9
    val rows = for (d <- 0 until 10; _ <- 0 until 2)
      yield (java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(d.toLong * 86400 + 3600)), 1L)
    val df = rows.toDF("ts", "v")
    val out = TimeSeries.walkForwardFolds(df, "ts", 5)
      .orderBy("fold").collect()
    assert(out.length == 5)
    // 10 days / 5 folds -> 2 days per fold, 4 rows each
    out.zipWithIndex.foreach { case (r, idx) =>
      assert(r.getInt(0) == idx + 1)
      assert(r.getLong(1) == idx * 2L)      // test_day_min
      assert(r.getLong(2) == idx * 2L + 1)  // test_day_max
      assert(r.getLong(3) == 4L)            // test_rows
      assert(r.getLong(4) == idx * 4L)      // train_rows (expanding)
    }
  }

  test("powerIteration converges to the dominant eigenvector") {
    // symmetric matrix [[2,1],[1,2]]: eigvals 3 (v=[1,1]/sqrt2), 1
    val tri = Seq((0, 0, 2.0), (0, 1, 1.0), (1, 1, 2.0)).toDF("i", "j", "a")
    val out = graft.operators.LinAlg
      .powerIteration(tri, "i", "j", "a", dim = 2, rounds = 6)
      .orderBy("i").collect()
    val inv = 1.0 / math.sqrt(2.0)
    assert(math.abs(out(0).getDouble(1) - inv) < 1e-9)
    assert(math.abs(out(1).getDouble(1) - inv) < 1e-9)
    assert(math.abs(out(0).getDouble(2) - 3.0) < 1e-9) // eigval
  }

  test("topTwoComponents recovers both eigenpairs after deflation") {
    // [[2,1],[1,2]]: eigvals 3 (v=[1,1]/sqrt2) and 1 (v=[1,-1]/sqrt2)
    val tri = Seq((0, 0, 2.0), (0, 1, 1.0), (1, 1, 2.0)).toDF("i", "j", "a")
    val out = graft.operators.LinAlg
      .topTwoComponents(tri, "i", "j", "a", dim = 2, rounds = 6)
      .orderBy("component", "i").collect()
    val inv = 1.0 / math.sqrt(2.0)
    assert(math.abs(out(0).getAs[Double]("eigval") - 3.0) < 1e-9)
    assert(math.abs(out(2).getAs[Double]("eigval") - 1.0) < 1e-6)
    // second component is [1,-1]/sqrt2 up to sign
    val v2 = Seq(out(2).getAs[Double]("v"), out(3).getAs[Double]("v"))
    assert(math.abs(math.abs(v2.head) - inv) < 1e-6)
    assert(math.abs(v2.head + v2(1)) < 1e-6) // opposite signs
    // explained fractions: 3/4 and 1/4 of the trace
    assert(math.abs(out(0).getAs[Double]("explained") - 0.75) < 1e-9)
    assert(math.abs(out(2).getAs[Double]("explained") - 0.25) < 1e-6)
  }

  test("reconstructionOutliers: residual vs an explicit orthonormal basis") {
    // components = e1, e2 of R^3: in-plane vectors reconstruct exactly,
    // out-of-plane mass is the residual
    val comps = Seq((1, 0, 1.0), (1, 1, 0.0), (1, 2, 0.0),
      (2, 0, 0.0), (2, 1, 1.0), (2, 2, 0.0)).toDF("component", "i", "v")
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, 0.0f)),   // residual 0
      (1L, Array(0.0f, 0.0f, 3.0f)),   // residual 9
      (2L, Array(1.0f, 0.0f, 2.0f)))   // residual 4
      .toDF("vec_id", "embedding")
    val out = graft.operators.LinAlg.reconstructionOutliers(
      vecs, "vec_id", "embedding", comps, topN = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq === Seq((1L, 9.0), (2L, 4.0)))
  }

  test("centroidDrift: exact L2 between consecutive snapshot means") {
    val df = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(2.0f, 0.0f)),   // snap 0: mean (1,0)
      (2L, Array(4.0f, 3.0f)), (3L, Array(4.0f, 3.0f)),   // snap 1: mean (4,3)
      (4L, Array(4.0f, 3.0f)))                            // snap 2: mean (4,3)
      .toDF("vec_id", "embedding")
    val byHalf = df.withColumn("snap", floor(col("vec_id") / 2).cast("long"))
    val out = graft.operators.LinAlg.centroidDrift(byHalf, "snap", "embedding")
      .orderBy($"snap").collect().map(r => (r.getLong(0), r.getDouble(1)))
    // snap1 vs snap0: dist((4,3),(1,0)) = sqrt(9+9) ; snap2 vs snap1: 0
    assert(out.map(_._1).toSeq === Seq(1L, 2L))
    assert(math.abs(out.head._2 - math.sqrt(18.0)) < 1e-9)
    assert(out(1)._2 === 0.0)
  }

  test("latenessAudit: counts drops per watermark with exact lateness") {
    // one user; arrival order a,b,c,d; event times 100, 300, 200, 250 s.
    // hwm-lateness: a:0, b:0, c:100s, d:50s
    val df = Seq(
      ("a", 100L), ("b", 300L), ("c", 200L), ("d", 250L))
      .toDF("arr", "sec")
      .withColumn("user_id", lit(1L))
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = graft.operators.EventAnalytics
      .latenessAudit(df, "user_id", "ts", "arr", Seq(0L, 60L, 120L))
      .orderBy("threshold_sec").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 60L, 120L))
    // wm 0s: c,d late; wm 60s: only c (100s > 60s); wm 120s: none
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 1L, 0L))
    assert(out.forall(_.getLong(1) == 4L))
    assert(out.forall(_.getLong(4) == 100L * 1000000L)) // max lateness
  }

  test("mergeableMoments: merged __all row equals global moments") {
    val df = Seq(("x", 1.0), ("x", 3.0), ("y", 5.0), ("y", 7.0), ("y", 9.0))
      .toDF("k", "v")
    val out = graft.operators.NumericFeatures
      .mergeableMoments(df, "k", "v")
      .orderBy("slice").collect()
    val m = out.map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(m("x") == ((2L, 2.0, 1.0)))
    assert(m("y")._1 == 3L && m("y")._2 == 7.0)
    assert(math.abs(m("y")._3 - 8.0 / 3) < 1e-7) // variance rounds at 8
    // global: n=5, mean=5, var = (1+9+25+49+81)/5 - 25 = 33 - 25 = 8
    assert(m("__all") == ((5L, 5.0, 8.0)))
  }

  test("diversityIndex: exact Simpson from category counts") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "b"),
      (2L, "a"), (2L, "a"), (2L, "a")).toDF("k", "c")
    val out = graft.operators.EventAnalytics.diversityIndex(df, "k", "c")
      .orderBy("k").collect()
    // k=1: n=4, ss=8 -> simpson = 1 - 8/16 = 0.5, inv = 2
    assert(out(0).getLong(1) == 4L && out(0).getLong(2) == 2L)
    assert(out(0).getDouble(3) == 0.5 && out(0).getDouble(4) == 2.0)
    // k=2: one category -> simpson 0, inv 1
    assert(out(1).getDouble(3) == 0.0 && out(1).getDouble(4) == 1.0)
  }

  test("quantileNormalize maps each source onto the global marginal") {
    // source A runs hot (values 10x source B); after normalization
    // both sources' rank-order maps into the combined distribution
    val df = Seq(
      ("A", 10.0), ("A", 20.0), ("A", 30.0),
      ("B", 1.0), ("B", 2.0), ("B", 3.0)).toDF("src", "v")
    val out = graft.operators.NumericFeatures
      .quantileNormalize(df, "src", "v", gridDecimals = 2)
      .orderBy("src", "v").collect()
    // global sorted: 1,2,3,10,20,30 (N=6). pr in each source: 0,.5,1
    // -> k = floor(pr*5+0.5) = 0, 3, 5 -> targets 1, 10, 30 for BOTH
    val a = out.filter(_.getString(0) == "A").map(_.getDouble(2)).toSeq
    val b = out.filter(_.getString(0) == "B").map(_.getDouble(2)).toSeq
    assert(a == Seq(1.0, 10.0, 30.0))
    assert(b == Seq(1.0, 10.0, 30.0))
  }

  test("scd2 collapses runs, reopens on A->B->A, half-open intervals") {
    def ts(s: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))
    val df = Seq(
      (1L, ts(10), "A", 1L), (1L, ts(20), "A", 2L), (1L, ts(30), "B", 3L),
      (1L, ts(40), "A", 4L),
      (2L, ts(10), "X", 5L)).toDF("k", "ts", "attr", "id")
    val out = graft.operators.History.scd2(df, "k", "ts", "attr", "id")
      .orderBy("k", "valid_from").collect()
    assert(out.length == 4)
    // user 1: A[10,30) n=2, B[30,40) n=1, A[40,null) current
    assert(out(0).getString(2) == "A" && out(0).getLong(3) == 2L
      && out(0).getTimestamp(4) == ts(30) && !out(0).getBoolean(5))
    assert(out(1).getString(2) == "B" && out(1).getTimestamp(4) == ts(40))
    assert(out(2).getString(2) == "A" && out(2).isNullAt(4)
      && out(2).getBoolean(5))
    assert(out(3).getLong(0) == 2L && out(3).getBoolean(5))
  }

  test("mannWhitney: exact U and z on a hand-computed sample") {
    // slice a: 1, 2; slice b: 3, 4 -> ranks 1,2 | 3,4; R1=3, U1=0, U2=4
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("s", "v")
    val r = graft.operators.RankStats.mannWhitney(df, "s", "v").collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 4.0)
    val z = (0.0 - 2.0 * 2.0 / 2) / math.sqrt(2.0 * 2.0 * 5.0 / 12)
    assert(math.abs(r.getDouble(4) - z) < 1e-8)
  }

  test("mannWhitney assigns tied values their average rank") {
    // a: 1, 2; b: 2, 3 -> ranks 1, 2.5 | 2.5, 4; R1 = 3.5 -> U1 = 0.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("s", "v")
    val r = graft.operators.RankStats.mannWhitney(df, "s", "v").collect()(0)
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 3.5)
  }

  test("spearman: monotone is 1, reversed is -1, ties averaged") {
    val mono = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0)).toDF("x", "y")
    assert(graft.operators.RankStats.spearman(mono, "x", "y")
      .collect()(0).getDouble(1) == 1.0)
    val rev = Seq((1.0, 30.0), (2.0, 20.0), (3.0, 10.0)).toDF("x", "y")
    assert(graft.operators.RankStats.spearman(rev, "x", "y")
      .collect()(0).getDouble(1) == -1.0)
  }

  test("dpNoisyCounts: deterministic, bounded noise, exact base counts") {
    val df = Seq("a", "a", "a", "b").toDF("c")
    val out1 = graft.operators.Privacy.dpNoisyCounts(df, "c", 1.0, 42L)
      .orderBy("c").collect()
    val out2 = graft.operators.Privacy.dpNoisyCounts(df, "c", 1.0, 42L)
      .orderBy("c").collect()
    assert(out1.map(_.getDouble(2)).toSeq == out2.map(_.getDouble(2)).toSeq)
    assert(out1(0).getLong(1) == 3L && out1(1).getLong(1) == 1L)
    // Laplace(1/eps=1) noise from clamped u: |noise| <= ln(1e6) ~ 13.8
    out1.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getLong(1)) <= 13.9)
    }
    // tighter epsilon -> proportionally larger noise, same u
    val loose = graft.operators.Privacy.dpNoisyCounts(df, "c", 0.5, 42L)
      .orderBy("c").collect()
    out1.zip(loose).foreach { case (t, l) =>
      val nt = t.getDouble(2) - t.getLong(1)
      val nl = l.getDouble(2) - l.getLong(1)
      assert(math.abs(nl - 2 * nt) < 1e-5)
    }
  }

  test("rocAucByGroup matches per-group hand AUC with ties") {
    // group g1: perfect separation -> 1.0; g2: one tie -> 0.75
    val df = Seq(
      ("g1", 0.1, 0L), ("g1", 0.2, 0L), ("g1", 0.9, 1L),
      ("g2", 0.3, 0L), ("g2", 0.5, 0L), ("g2", 0.5, 1L), ("g2", 0.7, 1L))
      .toDF("g", "score", "label")
    val out = graft.operators.Evaluation
      .rocAucByGroup(df, "score", "label", "g")
      .orderBy("g").collect()
    assert(out(0).getDouble(3) == 1.0)
    // g2 pairs: (0.3,0.5)=1, (0.3,0.7)=1, (0.5,0.5)=0.5, (0.5,0.7)=1
    // -> 3.5/4 = 0.875
    assert(out(1).getDouble(3) == 0.875)
    // single-class group -> null auc, not NaN
    val single = Seq(("g", 0.5, 1L), ("g", 0.7, 1L)).toDF("g", "score", "label")
    assert(graft.operators.Evaluation
      .rocAucByGroup(single, "score", "label", "g").collect()(0).isNullAt(3))
  }

  test("splitConformal: exact threshold and held-out coverage") {
    val df = Seq(
      // calib (id even): group g values 0, 10 -> mean 5, nc = {5, 5}
      (0L, "g", 0.0), (2L, "g", 10.0),
      // test (id odd): nc = 4 (covered), 15 (not)
      (1L, "g", 1.0), (3L, "g", 20.0)).toDF("id", "grp", "v")
    val r = graft.operators.Evaluation.splitConformal(
      df, "v", "grp", pmod(col("id"), lit(2L)) === 0, q = 0.5).collect()(0)
    assert(r.getDouble(0) == 5.0)  // percentile([5,5], .5)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.5)
  }

  test("partitioned sink: lossless roundtrip and partition-pruned scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout_spec")
    val df = Seq(
      ("a", 1L, 1.5), ("a", 2L, 2.5), ("b", 3L, 3.5), ("c", 4L, 4.5))
      .toDF("part", "k", "v")
    graft.sources.Layout.writePartitioned(
      df, tmp.toString, partCol = "part", sortCol = "k",
      tasksPerPartition = 2)
    val back = spark.read.option("basePath", tmp.toString)
      .parquet(tmp.toString).where(col("part") === "a")
    // pruning: only partition a's files are read
    val scan = back.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("part#"),
      s"expected partition filters in scan:\n$scan")
    val rows = back.select("k", "v").orderBy("k").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 1.5), (2L, 2.5)))
  }

  test("theilSenTrend: median slope resists a corrupted pair") {
    def ts(d: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(d * 86400))
    // value = 2*day except one wild outlier at id 5; stride-1 pairs
    val df = Seq(
      (0L, ts(0), 0.0), (1L, ts(1), 2.0), (2L, ts(2), 4.0),
      (3L, ts(3), 6.0), (4L, ts(4), 8.0), (5L, ts(5), 1000.0))
      .toDF("id", "ts", "v")
    val r = graft.operators.TimeSeries
      .theilSenTrend(df, "id", "ts", "v", stride = 1L).collect()(0)
    assert(r.getLong(0) == 5L)
    // slopes: 2,2,2,2,992 -> median 2 (the mean would be ~200)
    assert(r.getDouble(1) == 2.0)
  }

  test("thresholdSweep: one pass, exact confusion counts per threshold") {
    val df = Seq((0.2, 0L), (0.4, 1L), (0.6, 0L), (0.8, 1L))
      .toDF("score", "label")
    val out = graft.operators.Evaluation
      .thresholdSweep(df, "score", "label", Seq(0.5, 0.9))
      .orderBy("threshold").collect()
    // t=0.5: pred {0.6, 0.8} -> tp=1 fp=1 tn=1 fn=1 -> precision .5
    assert(out(0).getLong(1) == 1L && out(0).getLong(2) == 1L)
    assert(out(0).getDouble(5) == 0.5 && out(0).getDouble(6) == 0.5)
    // t=0.9: nothing predicted positive -> precision null, recall 0
    assert(out(1).getLong(1) == 0L && out(1).isNullAt(5))
    assert(out(1).getDouble(6) == 0.0)
  }

  test("gapStats: exact gap quantiles and split fraction") {
    def ts(s: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))
    // one user, events at 0, 10, 30, 100 -> gaps 10, 20, 70
    val df = Seq((1L, ts(0), 1L), (1L, ts(10), 2L), (1L, ts(30), 3L),
      (1L, ts(100), 4L)).toDF("k", "ts", "id")
    val r = graft.operators.Sessions.gapStats(df, "k", "ts", "id", 15L)
      .collect()(0)
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 20.0) // median gap
    assert(r.getLong(4) == 2L)     // 20 and 70 exceed 15s
  }

  test("hashEmbedding: deterministic, bounded, mean-pooled") {
    val df = Seq((1L, "a b"), (2L, "a"), (3L, "a b")).toDF("id", "t")
    val out = graft.operators.TextAnalysis
      .hashEmbedding(df, "id", "t", dim = 4, seed = 7L)
      .orderBy("id", "d").collect()
    assert(out.length == 12)
    // all values inside the uniform's [-0.5, 0.5) range
    out.foreach(r => assert(math.abs(r.getDouble(2)) <= 0.5))
    // identical text -> identical vector (docs 1 and 3)
    val v1 = out.filter(_.getLong(0) == 1L).map(_.getDouble(2)).toSeq
    val v3 = out.filter(_.getLong(0) == 3L).map(_.getDouble(2)).toSeq
    assert(v1 == v3)
    // doc 2's vector = token a's raw vector; doc 1 = mean(a, b) != a
    val v2 = out.filter(_.getLong(0) == 2L).map(_.getDouble(2)).toSeq
    assert(v1 != v2)
  }

  test("trimmedMeanByKey: whale excluded from trimmed, kept in raw") {
    val vals = (1 to 99).map(i => ("k", i.toDouble)) :+ (("k", 100000.0))
    val r = graft.operators.NumericFeatures
      .trimmedMeanByKey(vals.toDF("k", "v"), "k", "v").collect()(0)
    assert(r.getLong(1) == 100L)
    // p95 band drops the whale (and the low tail edge)
    assert(r.getLong(2) < 100L)
    assert(r.getDouble(3) < 60.0)   // trimmed stays near the true center
    assert(r.getDouble(4) > 1000.0) // raw mean dominated by the whale
  }

  test("labelPropagation: spreads, clamps seeds, breaks ties by min label") {
    val verts = Seq(
      (1L, Some(0)), (2L, None), (3L, None), (4L, None), (5L, Some(1)))
      .toDF("id", "seed")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val out = graft.operators.Graphs
      .labelPropagation(verts, "id", "seed", edges, "src", "dst", rounds = 2)
      .orderBy("id").collect()
    // round 1: v2 <- 0 (from v1), v4 <- 1 (from v5), v3 unlabeled.
    // round 2: v3 sees {0 (v2), 1 (v4)} tied -> min label 0.
    assert(out.map(r => r.getLong(0) -> r.get(2)).toMap ==
      Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1))
    // seeds clamped
    assert(out(0).getInt(2) == 0 && out(4).getInt(2) == 1)
    // seed_label column preserved (null for non-seeds)
    assert(out(1).isNullAt(1) && !out(0).isNullAt(1))
  }

  test("walkForwardFolds is time-ordered: no fold trains on its future") {
    val rows = for (d <- 0 until 7)
      yield (java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(d.toLong * 86400)), 1L)
    val out = TimeSeries.walkForwardFolds(rows.toDF("ts", "v"), "ts", 3)
      .orderBy("fold").collect()
    // every fold's train rows equal the sum of all earlier test rows
    var cum = 0L
    out.foreach { r =>
      assert(r.getLong(4) == cum)
      cum += r.getLong(3)
    }
    // test windows are disjoint and increasing
    out.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) < b.getLong(1))
      case _ =>
    }
  }

  test("skipgramPairs: symmetric window pairs, no subsampling at big t") {
    import spark.implicits._
    // sampleT huge -> keep prob 1 for every word: pure windowing
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val out = Collocations.skipgramPairs(df, "doc_id", "text",
      window = 2, sampleT = 1e9, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // center a: contexts b, c; center b: a, c, d; symmetric counts
    assert(out(("a", "b")) === 1L)
    assert(out(("a", "c")) === 1L)
    assert(out.get(("a", "d")).isEmpty) // distance 3 > window
    assert(out(("b", "a")) === out(("a", "b")))
    assert(out(("b", "d")) === 1L)
    // total pairs = 2 * (#adjacent + #distance-2) = 2 * (3 + 2)
    assert(out.values.sum === 10L)
  }

  test("skipgramPairs subsampling drops frequent words and re-indexes") {
    import spark.implicits._
    // 'the' dominates; tiny t must drop at least some 'the' occurrences,
    // and re-indexing brings its neighbors into one another's windows
    val text = (1 to 50).map(i => s"the w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val pairs = Collocations.skipgramPairs(df, "doc_id", "text",
      window = 1, sampleT = 1e-4, minCount = 1L).collect()
    val theCount = pairs.filter(_.getString(0) == "the").map(_.getLong(2)).sum
    val full = Collocations.skipgramPairs(df, "doc_id", "text",
      window = 1, sampleT = 1e9, minCount = 1L).collect()
      .filter(_.getString(0) == "the").map(_.getLong(2)).sum
    assert(theCount < full)
    // some rare-rare adjacency exists only because a 'the' was deleted
    val rareRare = pairs.exists(r =>
      r.getString(0).startsWith("w") && r.getString(1).startsWith("w"))
    assert(rareRare)
  }
}

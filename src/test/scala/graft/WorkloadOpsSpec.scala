package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.MortonExpr
import graft.operators.{Association, EventAnalytics, Graphs, Reshape, ScaleAudit}

/** RFM / survival / association cells / melt / skew audit / Morton /
  * BFS — batch semantics on literal frames with hand-computed answers.
  */
class WorkloadOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("rfmSegments: recency inverts, breakpoints score 1-5 deterministically") {
    // 5 users, distinct frequency 1..5 -> f_score must be 1..5
    val rows = (1 to 5).flatMap { u =>
      (1 to u).map(i =>
        (u.toLong, ts(f"2024-01-${u}%02d 0$i:00:00"), i * 10.0))
    }
    val got = EventAnalytics.rfmSegments(
      rows.toDF("user_id", "ts", "value"), "user_id", "ts", "value")
      .orderBy($"user_id").collect()
    val fScores = got.map(_.getAs[Long]("f_score")).toSeq
    assert(fScores === Seq(1L, 2L, 3L, 4L, 5L))
    // user 5 is most recent (recency 0 -> r_score 5); user 1 least
    assert(got(4).getAs[Long]("r_score") === 5L)
    assert(got(0).getAs[Long]("r_score") === 1L)
    assert(got(4).getAs[String]("segment") === "555")
    // monetary = exact sum
    assert(got(4).getAs[Double]("monetary") === 150.0)
  }

  test("survivalTable: durations, censoring at horizon, at-risk arithmetic") {
    val df = Seq(
      // u1 signs up day0, purchases day2 -> dur 2 observed
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-03 00:00:00"), "purchase"),
      // u2 signs up day0, never purchases -> censored at horizon (day4)
      (2L, ts("2024-01-01 00:00:00"), "signup"),
      // u3 signs up day2, purchases day2 -> dur 0 observed
      (3L, ts("2024-01-03 00:00:00"), "signup"),
      (3L, ts("2024-01-03 06:00:00"), "purchase"),
      // u4: purchase BEFORE signup only -> censored, not dropped
      (4L, ts("2024-01-02 00:00:00"), "purchase"),
      (4L, ts("2024-01-05 00:00:00"), "signup"),
      // horizon-setting event
      (9L, ts("2024-01-05 00:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.survivalTable(
      df, "user_id", "ts", "event_type", "signup", "purchase")
      .orderBy($"dur_day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // durations: u1 obs@2, u2 cens@4, u3 obs@0, u4 cens@0
    // at-risk@0 = 4, events@0 = 1; at-risk@2 = 2, events@2 = 1
    assert(got.toSeq === Seq((0L, 1L, 1L, 4L), (2L, 1L, 0L, 2L)))
  }

  test("pmiCells and chiSquareCells: independence gives pmi 0 / chi2 0") {
    // perfectly independent 2x2: every cell n=5 of 20
    val rows = for { a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 5 }
      yield (a, b)
    val pmi = Association.pmiCells(rows.toDF("a", "b"), "a", "b")
      .collect().map(_.getAs[Double]("pmi"))
    assert(pmi.forall(_ == 0.0))
    val chi = Association.chiSquareCells(rows.toDF("a", "b"), "a", "b")
      .collect().map(_.getAs[Double]("chi2_contrib"))
    assert(chi.forall(_ == 0.0))
  }

  test("pmiCells: dependent cells sign correctly") {
    // a=x always with b=u (10), a=y always with b=v (10)
    val rows = Seq.fill(10)(("x", "u")) ++ Seq.fill(10)(("y", "v"))
    val got = Association.pmiCells(rows.toDF("a", "b"), "a", "b")
      .orderBy($"a").collect()
    // pmi = ln(10*20/(10*10)) = ln 2 for both observed cells
    got.foreach(r =>
      assert(math.abs(r.getAs[Double]("pmi") - math.log(2)) < 1e-9))
  }

  test("melt: wide metrics to long rows, values cast to double") {
    val df = Seq((1L, 2.0, 3.0), (2L, 5.0, 7.0)).toDF("id", "m1", "m2")
    val got = Reshape.melt(df, Seq("id"), Seq("m1", "m2"))
      .orderBy($"id", $"metric")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq(
      (1L, "m1", 2.0), (1L, "m2", 3.0), (2L, "m1", 5.0), (2L, "m2", 7.0)))
  }

  test("keySkewProfile: hot key shows in ratio and share") {
    val df = (Seq.fill(8)(1L) ++ Seq(2L, 3L)).toDF("k")
    val got = ScaleAudit.keySkewProfile(df, Seq("k")).head()
    assert(got.getAs[Long]("n_keys") === 3L)
    assert(got.getAs[Long]("n_rows") === 10L)
    assert(got.getAs[Long]("max_freq") === 8L)
    assert(math.abs(got.getAs[Double]("skew_ratio") - 8.0 / (10.0 / 3)) < 1e-12)
    assert(got.getAs[Double]("top_key_share") === 0.8)
  }

  test("MortonExpr: interleave matches the bit definition; codegen path runs") {
    // x=0b101 (5), y=0b011 (3) -> z bits: x at even, y at odd
    // = 1·1 + 1·2 + 0·4 + 1·8 + 1·16 + 0·32 = 27
    assert(MortonExpr.interleave(5L, 3L) === 27L)
    assert(MortonExpr.interleave(0L, 0L) === 0L)
    // high-bit coverage: bit 31 of x lands at bit 62
    assert(MortonExpr.interleave(1L << 31, 0L) === (1L << 62))
    // inputs beyond 32 bits wrap mod 2^32
    assert(MortonExpr.interleave(1L << 32, 0L) === 0L)
    val got = Seq((5L, 3L), (1023L, 0L))
      .toDF("x", "y")
      .select(MortonExpr.morton(spark, $"x", $"y").as("z"))
      .orderBy($"z")
      .collect().map(_.getLong(0))
    // spread(1023) = sum of 4^k for k<10 = (4^10-1)/3 = 349525
    assert(got.toSeq === Seq(27L, 349525L))
    // z-order locality sanity: nearby points interleave near each other
    assert(MortonExpr.interleave(2L, 2L) < MortonExpr.interleave(512L, 512L))
  }

  test("scd2Intervals: lead closes windows; last change stays open; ties version in id order") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "a"),
      (1L, ts("2024-01-03 00:00:00"), 11L, "b"),
      (1L, ts("2024-01-03 00:00:00"), 12L, "c"), // same ts: tie on id
      (2L, ts("2024-01-02 00:00:00"), 20L, "x"))
      .toDF("k", "ts", "seq", "v")
    val got = graft.operators.Merge.scd2Intervals(log, "k", "ts", "seq")
      .orderBy($"k", $"valid_from", $"seq")
      .collect().map(r => (r.getAs[Long]("seq"),
        Option(r.getAs[Timestamp]("valid_to")).map(_.toString),
        r.getAs[Boolean]("is_current")))
    assert(got.toSeq === Seq(
      (10L, Some("2024-01-03 00:00:00.0"), false),
      (11L, Some("2024-01-03 00:00:00.0"), false), // zero-width tie window
      (12L, None, true),
      (20L, None, true)))
  }

  test("eventPathNgrams: per-entity trigrams never span entities") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:01"), 1L, "a"),
      (1L, ts("2024-01-01 00:00:02"), 2L, "b"),
      (1L, ts("2024-01-01 00:00:03"), 3L, "c"),
      (1L, ts("2024-01-01 00:00:04"), 4L, "a"),
      (2L, ts("2024-01-01 00:00:01"), 5L, "b"),
      (2L, ts("2024-01-01 00:00:02"), 6L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.eventPathNgrams(
      df, "user_id", "ts", "event_id", "event_type", 3)
      .orderBy($"path")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // user 1 yields a>b>c and b>c>a; user 2 too short
    assert(got.toSeq === Seq(("a>b>c", 1L), ("b>c>a", 1L)))
  }

  test("cumulativeUsers and rollingActiveUsers: growth and trailing windows") {
    val df = Seq(
      (1L, ts("2024-01-01 01:00:00")),
      (1L, ts("2024-01-09 01:00:00")), // not new on day 8
      (2L, ts("2024-01-02 01:00:00")),
      (3L, ts("2024-01-02 02:00:00")))
      .toDF("user_id", "ts")
    val day0 = ts("2024-01-01 00:00:00").getTime * 1000 / 86400000000L
    val cum = EventAnalytics.cumulativeUsers(df, "user_id", "ts")
      .orderBy($"day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cum.toSeq === Seq((day0, 1L, 1L), (day0 + 1, 2L, 3L)))
    val wau = EventAnalytics.rollingActiveUsers(df, "user_id", "ts", 7)
      .orderBy($"day")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // day0: {1}; day1..day6: {1,2,3}; day7: {2,3} (day0 aged out);
    // day8: {1} only — u2/u3's day1 activity aged out, u1 re-active
    assert(wau.toMap === Map(
      day0 -> 1L, (day0 + 1) -> 3L, (day0 + 2) -> 3L, (day0 + 3) -> 3L,
      (day0 + 4) -> 3L, (day0 + 5) -> 3L, (day0 + 6) -> 3L,
      (day0 + 7) -> 2L, (day0 + 8) -> 1L))
  }

  test("degreeHistogram: undirected dedup'd degrees") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (4L, 5L))
      .toDF("src", "dst")
    val got = Graphs.degreeHistogram(edges)
      .orderBy($"degree")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // degrees: 1->2, 2->1, 3->1, 4->1, 5->1 => histogram 1:4, 2:1
    assert(got.toSeq === Seq((1L, 4L), (2L, 1L)))
  }

  test("bfsFromSeeds: minimum hop wins; depth bounded; seeds carried") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (5L, 6L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val got = Graphs.bfsFromSeeds(edges, seeds, "id", maxHops = 2)
      .orderBy($"vertex")
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    // 1@0; 2,3@1 (3 via the direct edge, never relabeled 2); 4@2; 5,6 unreachable
    assert(got.toSeq === Seq((1L, 0), (2L, 1), (3L, 1), (4L, 2)))
  }

  test("pruningStats: z-order touches fewer files than linear on a box probe") {
    // 32x32 grid, one row per cell: both layouts see identical data
    val grid = (for { x <- 0 until 32; y <- 0 until 32 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    // y-only predicate: the case x-major linear layout CANNOT prune
    val box = (0L, 31L, 4L, 11L)
    val z = ScaleAudit.pruningStats(grid, "x", "y",
      MortonExpr.morton(spark, $"x", $"y"), stride = 64L,
      box._1, box._2, box._3, box._4).head()
    val lin = ScaleAudit.pruningStats(grid, "x", "y",
      $"x" * 32L + $"y", stride = 64L,
      box._1, box._2, box._3, box._4).head()
    assert(z.getAs[Long]("n_files") === 16L)
    assert(lin.getAs[Long]("n_files") === 16L)
    // z-order: 64-value strides are aligned 8x8 Morton tiles, so only
    // the y-tiles {0,1} × all x-tiles = 8 of 16 files carry the band;
    // linear: every x-stripe spans the full y range -> all 16 touched
    assert(z.getAs[Long]("files_touched") === 8L)
    assert(lin.getAs[Long]("files_touched") === 16L)
    assert(z.getAs[Long]("n_rows") === 1024L)
  }

  test("rankNormalize: ties share percent_rank; range is [0,1]") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 2.0), ("g", 5.0))
      .toDF("k", "v")
    val got = graft.operators.Encoding.rankNormalize(df, "k", "v")
      .orderBy($"v")
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    // percent_rank: 0, 1/3, 1/3, 1
    assert(got.toSeq === Seq(
      (1.0, 0.0), (2.0, 1.0 / 3), (2.0, 1.0 / 3), (5.0, 1.0)))
  }

  test("planExportShards: next-fit split by running start offset") {
    // sizes 6,6,6 at target 10: starts 0,6,12 -> shards 0,0,1;
    // then 30 at start 18 -> shard 1 (overflows), 2 at start 48 -> 4
    val df = Seq((1L, 6L), (2L, 6L), (3L, 6L), (4L, 30L), (5L, 2L))
      .toDF("id", "sz")
    val got = ScaleAudit.planExportShards(df, "id", "sz", targetBytes = 10L)
      .orderBy($"shard")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_docs"),
        r.getAs[Long]("bytes"), r.getAs[Long]("min_id"),
        r.getAs[Long]("max_id")))
    assert(got.toSeq === Seq(
      (0L, 2L, 12L, 1L, 2L), (1L, 2L, 36L, 3L, 4L), (4L, 1L, 2L, 5L, 5L)))
    // bucket width must not change the plan
    val narrow = ScaleAudit.planExportShards(df, "id", "sz",
      targetBytes = 10L, bucketWidth = 2L)
      .orderBy($"shard").collect().map(_.toSeq)
    assert(narrow.toSeq === ScaleAudit.planExportShards(df, "id", "sz",
      targetBytes = 10L).orderBy($"shard").collect().map(_.toSeq).toSeq)
  }

  test("checksumReconcile: all five verdicts; order-independent; null-safe") {
    val left = Seq(
      ("g1", 1L, "a"), ("g1", 2L, "b"),      // match (right permutes order)
      ("g2", 3L, "c"),                        // count_mismatch (right adds)
      ("g3", 4L, "d"),                        // content_mismatch (value flips)
      ("g4", 5L, "e"))                        // missing_in_right
      .toDF("g", "id", "v")
    val right = Seq(
      ("g1", 2L, "b"), ("g1", 1L, "a"),
      ("g2", 3L, "c"), ("g2", 9L, "z"),
      ("g3", 4L, "D"),
      ("g5", 6L, "f"))                        // missing_in_left
      .toDF("g", "id", "v")
    val got = ScaleAudit.checksumReconcile(left, right, "g", Seq("id", "v"))
      .orderBy($"grp").collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[String]("status"))).toSeq
    assert(got === Seq(
      ("g1", "match"), ("g2", "count_mismatch"),
      ("g3", "content_mismatch"), ("g4", "missing_in_right"),
      ("g5", "missing_in_left")))
    // null content is distinct from its sentinel-adjacent renderings:
    // ("a", null) vs ("a", null-free "") must NOT collide
    val l2 = Seq(("g", "a", null.asInstanceOf[String])).toDF("g", "x", "y")
    val r2 = Seq(("g", "a", "")).toDF("g", "x", "y")
    val st = ScaleAudit.checksumReconcile(l2, r2, "g", Seq("x", "y"))
      .collect().map(_.getAs[String]("status")).toSeq
    assert(st === Seq("content_mismatch"))
  }

  test("joinCardinalityProfile: exact output size from histograms, " +
    "worst key flagged, nulls dropped, empty match degrades") {
    val a = Seq(1L, 1L, 1L, 2L, 3L).map(Tuple1(_)).toDF("k")
      .unionByName(Seq(Tuple1(null.asInstanceOf[java.lang.Long])).toDF("k"))
    val b = Seq(1L, 1L, 2L, 9L).map(Tuple1(_)).toDF("k")
    val r = ScaleAudit.joinCardinalityProfile(a, b, "k", "k")
      .collect().head
    // matched keys 1 (3x2=6) and 2 (1x1=1): 7 output rows, top key 1
    assert(r.getAs[Long]("n_keys_a") === 3L)     // null key dropped
    assert(r.getAs[Long]("n_keys_b") === 3L)
    assert(r.getAs[Long]("n_keys_matched") === 2L)
    assert(r.getAs[Long]("rows_a") === 5L && r.getAs[Long]("rows_b") === 4L)
    // counts accumulate in decimal(38,0) (Long-overflow-proof at
    // skewed 100TB key frequencies) and present as exact doubles
    assert(r.getAs[Double]("output_rows") === 7.0)
    assert(r.getAs[String]("top_key") === "1")
    assert(r.getAs[Double]("top_key_rows") === 6.0)
    assert(r.getAs[Double]("top_share") === math.floor(6.0 / 7.0 * 1e9) / 1e9)
    // cross-check against the actual join
    assert(a.join(b, Seq("k")).count() === 7L)
    // disjoint keys: zero output, null top
    val r0 = ScaleAudit.joinCardinalityProfile(
      Seq(Tuple1(1L)).toDF("k"), Seq(Tuple1(2L)).toDF("k"), "k", "k")
      .collect().head
    assert(r0.getAs[Double]("output_rows") === 0.0)
    assert(r0.isNullAt(r0.fieldIndex("top_share")))
  }
}

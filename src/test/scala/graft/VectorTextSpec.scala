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
}

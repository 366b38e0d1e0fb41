package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.operators.Selection

class SelectionSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  /** Naive single-window reference implementation. */
  private def naive(df: org.apache.spark.sql.DataFrame, frac: Double) = {
    val w = Window.partitionBy($"k").orderBy($"s".desc, $"id".asc)
    val n = Window.partitionBy($"k")
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .filter($"__rn" <= ceil($"__n" * lit(frac)))
      .select($"id", $"k", $"s")
  }

  private def mkDf(rows: Seq[(Long, String, Double)]) = rows.toDF("id", "k", "s")

  test("bucketed rank equals the naive single-window rank, incl. heavy score ties") {
    val rnd = new scala.util.Random(7)
    // two keys, skewed sizes; duplicate scores on purpose (coarse grid)
    val rows = (1 to 400).map(i =>
      (i.toLong, if (i % 10 == 0) "small" else "big",
        (rnd.nextInt(12) / 4.0))) // many exact ties
    val df = mkDf(rows)
    for (frac <- Seq(0.1, 0.4, 1.0); buckets <- Seq(1, 4, 64)) {
      val got = Selection.topFracPerKey(df, "k", "s", frac, Seq("id"), buckets)
        .select($"id", $"k", $"s")
      val want = naive(df, frac)
      assert(got.exceptAll(want).count() === 0 &&
        want.exceptAll(got).count() === 0, s"frac=$frac buckets=$buckets")
    }
  }

  test("null scores rank LAST, matching the naive desc_nulls_last order") {
    val df = Seq((1L, "a", Some(0.9)), (2L, "a", Some(0.5)),
      (3L, "a", None), (4L, "a", Some(0.7))).toDF("id", "k", "s")
    // top half of 4 rows = 2 rows: the two best REAL scores, never the null
    val got = Selection.topFracPerKey(df, "k", "s", 0.5, Seq("id"))
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 4L))
    // frac=1 still keeps the null-score row
    assert(Selection.topFracPerKey(df, "k", "s", 1.0, Seq("id")).count() === 4)
  }

  test("frac=1 keeps everything; tiny keys survive bucketing") {
    val df = mkDf(Seq((1L, "a", 0.5), (2L, "a", 0.1), (3L, "b", 0.9)))
    assert(Selection.topFracPerKey(df, "k", "s", 1.0, Seq("id")).count() === 3)
    // single-row key with frac .4 -> ceil(.4) = 1 row kept
    val got = Selection.topFracPerKey(df, "k", "s", 0.4, Seq("id"))
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L))
  }

  test("null keys are a real group: kept at frac=1, ranked within their group") {
    val df = Seq((1L, Some("a"), 0.9), (2L, Some("a"), 0.1),
      (3L, Option.empty[String], 0.8), (4L, None, 0.2), (5L, None, 0.5))
      .toDF("id", "k", "s")
    assert(Selection.topFracPerKey(df, "k", "s", 1.0, Seq("id")).count() === 5)
    val kept = Selection.topFracPerKey(df, "k", "s", 0.4, Seq("id"))
      .select($"id").collect().map(_.getLong(0)).toSet
    // ceil(2*.4)=1 of key a (id 1); ceil(3*.4)=2 of the null key (ids 3, 5)
    assert(kept === Set(1L, 3L, 5L))
  }

  test("fuzz: bucketed rank equals naive rank on random data with null keys and scores") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 500).map { i =>
      val k = rnd.nextInt(4) match {
        case 0 => null
        case n => s"k$n"
      }
      val s = if (rnd.nextInt(10) == 0) null
        else Double.box(rnd.nextInt(8) / 2.0) // coarse grid: many ties
      (i.toLong, k, s)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.DoubleType))))
    for (frac <- Seq(0.2, 0.7, 1.0)) {
      val got = Selection.topFracPerKey(df, "k", "s", frac, Seq("id"))
      val want = naive(df, frac)
      assert(got.select($"id", $"k", $"s").exceptAll(want).count() === 0 &&
        want.exceptAll(got.select($"id", $"k", $"s")).count() === 0,
        s"frac=$frac")
    }
  }

  test("rankFeaturesPerKey equals the naive window rank and percent_rank") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(3)}", rnd.nextInt(10) / 3.0))
    val df = mkDf(rows)
    val w = Window.partitionBy($"k").orderBy($"s".desc, $"id".asc)
    val n = Window.partitionBy($"k")
    val want = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("percent_rank", percent_rank().over(w))
    val got = Selection.rankFeaturesPerKey(df, "k", "s", Seq("id"))
    assert(got.exceptAll(want).count() === 0 &&
      want.exceptAll(got).count() === 0)
    // single-row key: percent_rank 0.0, not null/NaN
    val one = Selection.rankFeaturesPerKey(
      mkDf(Seq((1L, "solo", 0.5))), "k", "s", Seq("id")).head
    assert(one.getAs[Long]("rank") === 1L &&
      one.getAs[Double]("percent_rank") === 0.0)
  }

  test("lengthBucketedBatches: hand-computed bands, batch cuts, naive-window parity") {
    val docs = Seq(
      (1L, 3L), (2L, 5L), (3L, 9L),    // band 0
      (4L, 12L), (5L, 15L), (6L, 19L), // band 1
      (7L, 25L)                        // band 2
    ).toDF("doc_id", "n_tokens")
    val got = Selection.lengthBucketedBatches(
      docs, "doc_id", "n_tokens", bucketWidth = 10, batchSize = 2)
      .select($"doc_id", $"band", $"batch_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // in-band rank is tokens desc, id asc; batches cut every 2 ranks
    assert(got === Map(
      3L -> (0L, 0L), 2L -> (0L, 0L), 1L -> (0L, 1L),
      6L -> (1L, 0L), 5L -> (1L, 0L), 4L -> (1L, 1L),
      7L -> (2L, 0L)))
    // fuzz vs the naive single-window cut: same assignment on random data
    val rnd = new scala.util.Random(11)
    val big = (1 to 500).map(i => (i.toLong, rnd.nextInt(200).toLong))
      .toDF("doc_id", "n_tokens")
    val w = Window.partitionBy($"band").orderBy($"n_tokens".desc, $"doc_id".asc)
    val want = big.withColumn("band", floor($"n_tokens" / lit(16)).cast("long"))
      .withColumn("batch_id",
        floor((row_number().over(w) - lit(1)) / lit(8)).cast("long"))
      .select($"doc_id", $"band", $"batch_id")
    val fuzz = Selection.lengthBucketedBatches(
      big, "doc_id", "n_tokens", bucketWidth = 16, batchSize = 8)
      .select($"doc_id", $"band", $"batch_id")
    assert(fuzz.exceptAll(want).count() === 0 &&
      want.exceptAll(fuzz).count() === 0)
    // every batch is within size and single-band by construction
    val sizes = fuzz.groupBy($"band", $"batch_id").count().collect()
    assert(sizes.forall(_.getLong(2) <= 8))
  }

  test("rejects empty tie-break and bad frac") {
    val df = mkDf(Seq((1L, "a", 0.5)))
    intercept[IllegalArgumentException] {
      Selection.topFracPerKey(df, "k", "s", 0.4, Nil)
    }
    intercept[IllegalArgumentException] {
      Selection.topFracPerKey(df, "k", "s", 0.0, Seq("id"))
    }
  }

  test("kCenterGreedy picks farthest-first with exact radii") {
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(10.0f, 0.0f)),
      (2L, Array(0.0f, 9.0f)), (3L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Selection.kCenterGreedy(pts, "vec_id", "embedding",
      seedId = 0L, k = 3)
      .orderBy($"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // round 2: farthest from {0} is id1 (d2=100) over id2 (81), id3 (2);
    // round 3: min-dist to {0,1} is 81 for id2, 2 for id3 -> id2
    assert(out.toSeq === Seq((1L, 0L, 0.0), (2L, 1L, 100.0), (3L, 2L, 81.0)))
  }

  test("mmrSelect: diversity penalty skips the duplicate at lambda 0.5") {
    // centroid of {(1,0),(1,0),(0,1)} is (2/3,1/3); rel(0)=rel(1)=2/√5,
    // rel(2)=1/√5. Pick 1: id0 (tie to lowest id). Pick 2: id1 scores
    // .5·2/√5 − .5·1 < .5·1/√5, so the orthogonal id2 wins over the
    // duplicate. Pick 3: only id1 left.
    val pts = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Selection.mmrSelect(pts, "vec_id", "embedding",
      k = 3, lambda = 0.5)
      .orderBy($"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(t => (t._1, t._2)).toSeq === Seq((1L, 0L), (2L, 2L), (3L, 1L)))
    val relTop = 2.0 / math.sqrt(5.0)
    assert(math.abs(out(0)._3 - 0.5 * relTop) < 1e-9)
    assert(math.abs(out(1)._3 - 0.5 / math.sqrt(5.0)) < 1e-9)
    assert(math.abs(out(2)._3 - (0.5 * relTop - 0.5)) < 1e-9)
    // lambda whose complement is inexact in binary is rejected
    intercept[IllegalArgumentException] {
      Selection.mmrSelect(pts, "vec_id", "embedding", k = 2, lambda = 0.7)
    }
  }

  test("scoreBucketSample: ntile arithmetic from the exact rank, " +
    "head kept whole, middle hash-sampled, tail dropped") {
    import graft.operators.Mixture
    // n = 10, k = 3: tiles of 4/3/3 by score desc, id asc on ties
    val df = (1L to 10L).map(i => (i, (100 - i).toDouble))
      .toDF("id", "score")
    val got = Selection.scoreBucketSample(df, "id", "score",
      keepFracs = Seq(1.0, 0.5, 0.0), seed = 11L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("bucket"), r.getAs[Boolean]("kept")))).toMap
    // scores descend with id, so rank == id: ids 1-4 tile 1,
    // 5-7 tile 2, 8-10 tile 3
    assert((1L to 10L).map(got(_)._1) ===
      Seq(1, 1, 1, 1, 2, 2, 2, 3, 3, 3))
    assert((1L to 4L).forall(got(_)._2))
    assert((8L to 10L).forall(!got(_)._2))
    // tile-2 membership IS sampleByHash membership at the same seed
    val sampled = Mixture.sampleByHash(
      Seq(5L, 6L, 7L).toDF("id"), "id", 0.5, 11L)
      .collect().map(_.getLong(0)).toSet
    assert((5L to 7L).map(i => i -> got(i)._2).toMap ===
      (5L to 7L).map(i => i -> sampled(i)).toMap)
    // ties on score break by id: both orderings still total
    val tied = Seq((1L, 5.0), (2L, 5.0), (3L, 1.0)).toDF("id", "score")
    val tg = Selection.scoreBucketSample(tied, "id", "score",
      Seq(1.0, 1.0, 1.0), 1L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("bucket"))
      .toMap
    assert(tg === Map(1L -> 1, 2L -> 2, 3L -> 3))
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Curriculum

/** Curriculum.order — the two-level salted global rank must be
  * byte-identical to the naive single-window row_number at any data
  * shape (that equality is the whole point of the decomposition).
  */
class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  test("order matches the naive global row_number over (bucket, hash, tie)") {
    val df = (1L to 500L).map(i => (i, i % 7)).toDF("id", "len")
    val bucket = col("len") // 7 buckets
    val hash = TextFunctions.md5Hash60(concat(col("id").cast("string"), lit(":s")))
    val got = Curriculum.order(df, bucket, hash, "id")
      .select(col("id"), col("train_order"))
    val naive = df
      .withColumn("__h",
        TextFunctions.md5Hash60(concat(col("id").cast("string"), lit(":s"))))
      .withColumn("train_order",
        row_number().over(Window.orderBy(col("len"), col("__h"), col("id")))
          .cast("long"))
      .select(col("id"), col("train_order"))
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
  }

  test("order is dense 1..n and respects bucket staging") {
    val df = Seq((1L, 0L), (2L, 2L), (3L, 0L), (4L, 1L), (5L, 2L))
      .toDF("id", "b")
    val hash = TextFunctions.md5Hash60(col("id").cast("string"))
    val got = Curriculum.order(df, col("b"), hash, "id")
      .select(col("id"), col("b"), col("train_order"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._3).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    // every bucket-0 row precedes every bucket-1 row, etc.
    val byBucket = got.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    assert(byBucket(0L).max < byBucket(1L).min)
    assert(byBucket(1L).max < byBucket(2L).min)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum ordering: assign every row a GLOBAL 1-based training-order
  * index in (difficulty bucket, deterministic shuffle hash) order — the
  * easy-first (or any staged) example schedule of curriculum learning,
  * with a within-bucket order that is a seeded content hash, so the
  * "shuffle" replays identically on recomputation and on incremental
  * re-runs.
  *
  * The naive formulation is `row_number() OVER (ORDER BY bucket, hash)`
  * — a single-partition sort of the whole corpus, the canonical
  * scale-killer. Here the rank is TWO-LEVEL (the [[Split]] trick,
  * globalized): rows range-bucket by the TOP BITS of the shuffle hash
  * (order-aligned: every row of salt s precedes every row of salt s+1
  * within a bucket), `row_number` runs within (bucket, salt) across
  * full parallelism, and per-(bucket, salt) offsets come from a window
  * over the tiny (buckets × 64)-row count aggregate, broadcast back
  * in-plan. Byte-identical to the single-window rank at any scale.
  */
object Curriculum {

  private val SaltBuckets = 64

  /** `df` plus `train_order` (global 1-based index in
    * (`bucket` asc, `hash` asc, `tieCol` asc) order). `hash` must be a
    * non-negative long narrower than 64 bits (`hashBits` wide, e.g.
    * [[graft.functions.TextFunctions.md5Hash60]] with 60); `tieCol`
    * completes the total order when hashes collide.
    */
  def order(
      df: DataFrame,
      bucket: Column,
      hash: Column,
      tieCol: String,
      hashBits: Int = 60): DataFrame = {
    require(hashBits > 6 && hashBits <= 63,
      s"hashBits must be in (6, 63], got $hashBits")
    val tagged0 = df
      .withColumn("__b", bucket)
      .withColumn("__h", hash)
      .withColumn("__salt", shiftrightunsigned(col("__h"), hashBits - 6))
    val wRank = Window.partitionBy(col("__b"), col("__salt"))
      .orderBy(col("__h"), col(tieCol))
    // offsets: one row per (bucket, salt) — the only unpartitioned
    // window runs over that tiny aggregate (buckets × 64 rows)
    val wOff = Window.orderBy(col("__b"), col("__salt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = tagged0.groupBy(col("__b"), col("__salt"))
      .agg(count(lit(1)).as("__bn"))
      .select(col("__b").as("__bk"), col("__salt").as("__sk"),
        coalesce(sum(col("__bn")).over(wOff), lit(0L)).as("__off"))
    tagged0
      .join(broadcast(offsets),
        col("__b") <=> col("__bk") && col("__salt") === col("__sk"))
      .withColumn("train_order", row_number().over(wRank) + col("__off"))
      .drop("__bk", "__sk", "__b", "__h", "__salt", "__off")
  }
}

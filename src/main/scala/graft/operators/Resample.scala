package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-interval time-series resampling with gap fill — pandas
  * `df.resample(freq).agg(...)` as a dataflow (the reference's velocity
  * features aggregate over sliding windows; resampling is the tumbling
  * complement every event-series consumer needs: uniform buckets,
  * EMPTY BUCKETS PRESENT with zero counts, so downstream models see a
  * regular series instead of silently skipping quiet periods).
  *
  * Plan shape: one hash aggregate onto (key, bucket) — micros
  * integer-divided by the bucket width, no float rounding — then each
  * key's observed [min, max] bucket span explodes into a dense grid
  * (`sequence`) that left-joins the aggregate back. The grid join is an
  * equi-join on (key, bucket): no window, no per-key single-task sort.
  * Grid size is span/width per key — the caller picks a width
  * proportionate to the span (a 1-second grid over a 10-year-sparse key
  * is 3·10⁸ rows, and that is the answer asked for, not a plan defect).
  *
  * Sums accumulate in decimal (order-independent, engine-exact), cast
  * back to double.
  */
object Resample {

  /** Rows with a null `tsCol` are EXCLUDED (a row without an event time
    * has no bucket) — an explicit filter, not a join accident.
    */
  def resample(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      bucketMicros: Long,
      valueCol: String): DataFrame = {
    require(bucketMicros > 0, s"bucket width must be > 0, got $bucketMicros")
    // floor division, not SQL `div` (which truncates toward zero and
    // would shift every pre-epoch bucket boundary): pmod is always
    // non-negative, so (x - pmod(x, b)) is an exact multiple of b and
    // the quotient is the true floor for any sign of x
    val micros = unix_micros(col(tsCol))
    // the numerator is an exact multiple of the width, so the decimal
    // quotient is integral — decimal (not double) division keeps it
    // exact for the full long range
    val bucket =
      ((micros - pmod(micros, lit(bucketMicros))).cast("decimal(30,0)")
        / lit(bucketMicros)).cast("long")
    val agg = df
      .filter(col(tsCol).isNotNull)
      .select(col(keyCol), bucket.as("__b"),
        col(valueCol).cast("decimal(25,6)").as("__v"))
      .groupBy(col(keyCol), col("__b"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
    val grid = agg
      .groupBy(col(keyCol))
      .agg(min(col("__b")).as("__mn"), max(col("__b")).as("__mx"))
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"))).as("__b"))
    // null-safe key equality: a NULL key is a real group out of the
    // aggregate, but NULL never equi-matches — a plain join would emit
    // fabricated all-zero buckets for the null key while its real
    // counts vanish
    grid.join(agg.withColumnRenamed(keyCol, "__k2").withColumnRenamed("__b", "__b2"),
        col(keyCol) <=> col("__k2") && col("__b") === col("__b2"), "left")
      .select(col(keyCol),
        timestamp_micros(col("__b") * lit(bucketMicros)).as("bucket_start"),
        coalesce(col("__n"), lit(0L)).as("n_events"),
        coalesce(col("__s").cast("double"), lit(0.0)).as("sum_value"))
  }
}

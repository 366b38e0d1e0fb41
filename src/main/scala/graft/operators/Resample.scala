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

  /** Systematic probability-proportional-to-size sampling WITHIN
    * STRATA — the survey-sampling design: inside each stratum, lay a
    * deterministic grid of `nPerStratum` equally spaced points over
    * the cumulative weight axis (offset half a step — the "random
    * start" pinned to 0.5 for reproducibility) and give each row one
    * copy per grid point that lands in its cumulative-weight
    * interval. Every row's inclusion count is within ±1 of
    * nPerStratum · w_i/W_stratum (the PPS guarantee); rows heavier
    * than one step are taken MULTIPLE times, which is the correct
    * certainty-selection behavior, not a defect.
    *
    * Scale shape: the cumulative weight is a window WITHIN each
    * stratum (ordered by id — the PPS frame order), so parallelism is
    * across strata; a single global unstratified sweep would need the
    * two-phase prefix-sum (per-partition partials + offsets) instead
    * of this window — callers with one giant stratum should shard it
    * first. Weights accumulate in DECIMAL, so interval boundaries are
    * exact and the grid-count arithmetic replays engine-for-engine.
    * Non-positive/null weights are excluded explicitly.
    *
    * Output: (stratumCol, idCol, weight, copies), copies >= 1 rows
    * only.
    */
  def systematicPps(
      df: DataFrame, stratumCol: String, idCol: String,
      weightCol: String, nPerStratum: Int): DataFrame = {
    require(nPerStratum >= 1, s"nPerStratum must be >= 1: $nPerStratum")
    val base = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(stratumCol).as("stratum"), col(idCol).as("id"),
        col(weightCol).cast("double").as("weight"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum")).orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = base
      .withColumn("__cw", sum(col("weight").cast("decimal(30,6)")).over(w))
    val tot = base.groupBy(col("stratum"))
      .agg(sum(col("weight").cast("decimal(30,6)")).as("__tw"))
    // grid points at (j + 0.5) * step, j = 0..n-1; a row's copies =
    // (#grid points <= cw) - (#grid points <= cw_prev), computed as
    // floor(cw/step + 0.5) clamped to n
    val joined = cum.join(tot, Seq("stratum"))
      .withColumn("__step",
        col("__tw").cast("double") / lit(nPerStratum.toDouble))
      .withColumn("__hi",
        least(floor(col("__cw").cast("double") / col("__step") + lit(0.5)),
          lit(nPerStratum.toLong)))
      .withColumn("__lo",
        least(floor((col("__cw") - col("weight").cast("decimal(30,6)"))
          .cast("double") / col("__step") + lit(0.5)),
          lit(nPerStratum.toLong)))
      .withColumn("copies", (col("__hi") - col("__lo")).cast("long"))
    joined.filter(col("copies") >= 1)
      .select(col("stratum").as(stratumCol), col("id").as(idCol),
        col("weight"), col("copies"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transaction-velocity features (reference `src/preprocessing/
  * transform_data.py:59-65`): per key (user / device / IP), the number of
  * *other* events by the same key in the trailing 24 h window.
  *
  * Spark-first shape: a RANGE window frame over event-time microseconds —
  * one shuffle per distinct key column, no global pre-sort (the reference's
  * `sort_values('purchase_time')` at transform_data.py:59 is unnecessary
  * here: window exec sorts within partitions itself).
  *
  * Frame semantics: RANGE BETWEEN -W AND 0 over `unix_micros(ts)` is
  * closed-closed `[t-W, t]` and includes same-timestamp peers — matching
  * pandas `.rolling('24h')` except for events *exactly* W apart, which
  * pandas (right-closed) excludes. Documented + unit-tested boundary.
  *
  * Scale note: the frame is per-key; skewed keys (power-law IPs) are the
  * risk at 100 TB. AQE skew handling does not split window partitions, so
  * for truly hot keys pre-aggregate to (key, second) counts first —
  * [[rollingCountsPreAgg]] — which bounds partition size by distinct
  * timestamps rather than events.
  */
object Velocity {

  private val MicrosPerSec = 1000000L

  /** Add one `<key><suffix>` column per key: count of other events by the
    * same key within `[ts - windowSec, ts]`.
    */
  def rollingCounts(
      df: DataFrame,
      tsCol: String,
      keys: Seq[String],
      windowSec: Long = 86400L,
      suffix: String = "_tx_24h"): DataFrame =
    keys.foldLeft(df) { (d, k) =>
      val w = Window
        .partitionBy(col(k))
        .orderBy(unix_micros(col(tsCol)))
        .rangeBetween(-windowSec * MicrosPerSec, 0)
      d.withColumn(s"$k$suffix", count(lit(1)).over(w) - lit(1L))
    }

  /** Hot-key-safe variant: collapse to per-(key, floor-second) counts,
    * run the range window over the collapsed rows, then join back. Same
    * result when `windowSec` is whole seconds and timestamps are compared
    * at second granularity.
    */
  def rollingCountsPreAgg(
      df: DataFrame,
      tsCol: String,
      key: String,
      windowSec: Long = 86400L,
      outCol: String = "tx_24h"): DataFrame = {
    val sec = unix_seconds(col(tsCol))
    val perSec = df
      .groupBy(col(key).as("__k"), sec.as("__sec"))
      .agg(count(lit(1)).as("__n"))
    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__sec"))
      .rangeBetween(-windowSec, 0)
    val counted = perSec.withColumn("__win", sum(col("__n")).over(w))
    df.join(
        counted,
        col(key) === col("__k") && sec === col("__sec"),
        "left")
      .withColumn(outCol, col("__win") - lit(1L))
      .drop("__k", "__sec", "__n", "__win")
  }

  /** Burst detection: hour buckets where an entity's event count
    * exceeds `factor` × its own mean hourly rate over its ACTIVE hours
    * (hours with ≥1 event — idle hours don't dilute the baseline, so a
    * once-a-day user with one 50-event hour still flags). Output: one
    * row per bursty (key, hour): key, hour_start_us, n (events that
    * hour), n_total, n_hours (the entity's totals).
    *
    * The comparison is kept INTEGER — `n · n_hours > factor · n_total`
    * — so both engines decide each row with exact arithmetic (no
    * mean-as-double threshold wobble at the boundary).
    *
    * Scale shape: collapse to per-(key, hour) counts first (one hash
    * aggregate, map-side partial), then per-key totals as a second tiny
    * aggregate joined back on the key — partition size is bounded by
    * distinct active hours per entity, never raw events.
    */
  def burstHours(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      factor: Int = 3): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    // hour bucket via pure integer ops (us − us mod hour): double
    // division could round across a bucket boundary at extreme epochs
    val us = unix_micros(col(tsCol))
    val perHour = df
      .groupBy(col(keyCol),
        (us - pmod(us, lit(3600L * MicrosPerSec))).as("hour_start_us"))
      .agg(count(lit(1)).as("n"))
    val perKey = perHour.groupBy(col(keyCol))
      .agg(sum(col("n")).as("n_total"), count(lit(1)).as("n_hours"))
    perHour.join(perKey, Seq(keyCol))
      .filter(col("n") * col("n_hours") > lit(factor.toLong) * col("n_total"))
      .select(col(keyCol), col("hour_start_us"), col("n"),
        col("n_total"), col("n_hours"))
  }

  /** Inter-arrival regularity audit — the metronome-bot detector: a
    * human's event gaps are bursty (coefficient of variation ≈ 1 for
    * Poisson-ish arrivals, higher for sessions), a scripted account
    * firing on a timer has CV ≈ 0 at ANY volume, which raw velocity
    * counts never see. Per key: gap count, mean/std of the inter-event
    * gaps in seconds (exact decimal moments, std from the
    * sum-of-squares identity with a max(.,0) guard), cv = std/mean,
    * and the `regular` flag (cv < cvFlag with at least minGaps gaps —
    * the volume floor keeps two-event accounts from flagging).
    *
    * Shape: one lag window per key ordered by (ts, tie), one hash
    * aggregate; only (key, gap) scalars shuffle.
    */
  def interArrivalRegularity(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      minGaps: Int = 5, cvFlag: Double = 0.1): DataFrame = {
    require(minGaps >= 2, s"minGaps must be >= 2, got $minGaps")
    require(cvFlag > 0, s"cvFlag must be > 0, got $cvFlag")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val gaps = df
      .withColumn("__prev", lag(unix_micros(col(tsCol)), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col(keyCol),
        ((unix_micros(col(tsCol)) - col("__prev")).cast("double")
          / lit(1000000.0)).as("__g"))
    gaps.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"),
        (sum(col("__g").cast("decimal(30,12)")).cast("double")
          / count(lit(1))).as("__mean"),
        (sum((col("__g") * col("__g")).cast("decimal(30,12)")).cast("double")
          / count(lit(1))).as("__m2"))
      .withColumn("mean_gap_s", round(col("__mean"), 3))
      .withColumn("std_gap_s", round(sqrt(greatest(
        col("__m2") - col("__mean") * col("__mean"), lit(0.0))), 3))
      .withColumn("cv", when(col("__mean") > 0,
        round(sqrt(greatest(col("__m2") - col("__mean") * col("__mean"),
          lit(0.0))) / col("__mean"), 6)).otherwise(lit(null)))
      .withColumn("regular",
        col("n_gaps") >= minGaps && coalesce(col("cv") < cvFlag, lit(false)))
      .select(col(keyCol), col("n_gaps"), col("mean_gap_s"),
        col("std_gap_s"), col("cv"), col("regular"))
  }
}

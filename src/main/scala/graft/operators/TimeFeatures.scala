package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temporal feature engineering (reference `src/preprocessing/
  * transform_data.py:54-57`): hour-of-day, day-of-week (pandas
  * `dt.dayofweek`, **Monday=0**), and elapsed time between two
  * timestamps in seconds / hours.
  *
  * All pure `Column` expressions — codegen'd, no UDFs.
  */
object TimeFeatures {

  /** F3: hour of day 0-23, as Long for cross-engine schema parity. */
  def hourOfDay(ts: Column): Column = hour(ts).cast("long")

  /** F4: pandas `dt.dayofweek` — Monday=0..Sunday=6. Spark's `weekday`
    * matches; `dayofweek` (Sunday=1) does NOT (SURVEY.md F4 trap).
    */
  def dayOfWeekMon0(ts: Column): Column = weekday(ts).cast("long")

  /** F5: elapsed seconds `(later - earlier).dt.total_seconds()`, double,
    * microsecond-precise.
    */
  def secondsBetween(earlier: Column, later: Column): Column =
    (unix_micros(later) - unix_micros(earlier)) / lit(1000000.0)

  /** F6: elapsed hours. */
  def hoursBetween(earlier: Column, later: Column): Column =
    secondsBetween(earlier, later) / lit(3600.0)

  /** The reference's full feature block (transform_data.py:54-65), over
    * generic column names: adds hour_of_day, day_of_week,
    * time_since_signup_seconds/_hours, then the three velocity counts.
    */
  def engineerFraudFeatures(
      df: DataFrame,
      purchaseTs: String = "purchase_time",
      signupTs: String = "signup_time",
      velocityKeys: Seq[String] = Seq("user_id", "device_id", "ip_address")): DataFrame = {
    val withTime = df
      .withColumn("hour_of_day", hourOfDay(col(purchaseTs)))
      .withColumn("day_of_week", dayOfWeekMon0(col(purchaseTs)))
      .withColumn("time_since_signup_seconds",
        secondsBetween(col(signupTs), col(purchaseTs)))
      .withColumn("time_since_signup_hours",
        hoursBetween(col(signupTs), col(purchaseTs)))
    val counted = Velocity.rollingCounts(withTime, purchaseTs, velocityKeys,
      suffix = "_transactions_24h")
    // reference column names (transform_data.py:60-62): the `_id` /
    // `_address` part of the key is dropped in the feature name
    val renames = Map(
      "user_id_transactions_24h" -> "user_transactions_24h",
      "device_id_transactions_24h" -> "device_transactions_24h",
      "ip_address_transactions_24h" -> "ip_transactions_24h")
    renames.foldLeft(counted) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
  }

  /** Per-entity inter-arrival profile: for each key, the number of
    * events, number of gaps (n_events − 1), and the exact mean / min /
    * max gap between consecutive events in (ts, tie) order, in
    * MICROSECONDS (integer end-to-end; the mean is one exact
    * decimal-sum ÷ count division in double — engine-neutral, no
    * float accumulation). The inter-arrival distribution is a classic
    * fraud/bot feature: humans have heavy-tailed gaps, scripted
    * traffic is metronomic.
    *
    * Scale shape: one lag window partitioned by the ENTITY key (state
    * bounded by one entity's history), then a hash aggregate on the
    * same key — the window's shuffle is reused by the groupBy
    * (same partitioning), so this is ONE shuffle total.
    */
  def interArrival(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String): DataFrame = {
    // order by the derived micros (bijective with ts) + tie — ts itself
    // is projected away before the window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__us"), col(tieCol))
    df.select(col(keyCol), col(tieCol), unix_micros(col(tsCol)).as("__us"))
      .withColumn("__gap", col("__us") - lag(col("__us"), 1).over(w))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("__gap")).as("n_gaps"),
        (sum(col("__gap").cast("decimal(25,0)")).cast("double")
          / count(col("__gap"))).as("mean_gap_us"),
        min(col("__gap")).as("min_gap_us"),
        max(col("__gap")).as("max_gap_us"))
  }
}

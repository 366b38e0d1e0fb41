package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history building: collapse an event log
  * of per-key attribute observations into SCD-type-2 validity
  * intervals — the warehouse-side complement of
  * [[Merge.extractDelta]] (delta says WHAT changed between two
  * snapshots; this says WHEN each value held, from the full log).
  */
object History {

  /** SCD2 intervals: for each key, consecutive runs of the same
    * attribute value collapse into one row (key, value, valid_from,
    * valid_to, is_current), `valid_to` = the next run's start (null
    * while current — half-open intervals, the join-friendly
    * convention). Re-observing an unchanged value extends the run;
    * A->B->A produces three intervals, as history requires.
    *
    * Shape: two per-key ordered windows (lag to mark change points,
    * running sum to number runs) + one hash aggregate + one lead —
    * every window partitions by the key, so this scales with per-key
    * history length, never corpus size. Ties on `tsCol` break by
    * `tieCol` so runs are deterministic.
    */
  def scd2(
      df: DataFrame, keyCol: String, tsCol: String, attrCol: String,
      tieCol: String): DataFrame = {
    val byTime = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val changed = df
      .withColumn("__prev", lag(col(attrCol), 1).over(byTime))
      // null-safe inequality: a null attribute observation starts its
      // own run rather than merging into any neighbor
      .withColumn("__chg",
        when(col("__prev") <=> col(attrCol), 0L).otherwise(1L))
      .withColumn("__run",
        sum(col("__chg")).over(byTime
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = changed.groupBy(col(keyCol), col("__run"))
      .agg(min(col(tsCol)).as("valid_from"),
        // all rows of a run share one attr value by construction
        // (runs split on <=> inequality), so min == that value
        min(col(attrCol)).as(attrCol),
        count(lit(1)).as("n_observations"))
    val byRun = Window.partitionBy(col(keyCol)).orderBy(col("__run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__run")
  }
}

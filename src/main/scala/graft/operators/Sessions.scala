package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch sessionization — the gaps-and-islands operator, expressed with
  * Spark's native `session_window` so the exact same grouping works
  * unchanged under Structured Streaming (with a watermark). Semantics:
  * two events of one key share a session iff the later starts at or
  * before (earlier ts + gap) — touching windows merge — and a session's
  * end is (last ts + gap).
  *
  * At scale this is one shuffle on the key (the session merge runs
  * inside the aggregation); no window-function sort over the whole
  * partition is needed.
  */
object Sessions {

  /** Per-key sessions with an inactivity gap. Output: key,
    * session_start_us / session_end_us (epoch micros — engine-neutral
    * timestamps), n_events, sum_value (exact decimal-accumulated sum of
    * `valueCol`).
    */
  def sessionize(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      gap: String,
      valueCol: String): DataFrame =
    df.groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(25,6)")).cast("double").as("sum_value"))
      .select(col(keyCol),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("sum_value"))
}

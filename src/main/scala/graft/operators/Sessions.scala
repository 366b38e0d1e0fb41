package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Behavioral-sequence assembly: each key's events become ONE
    * time-ordered token sequence (the log-to-training-document step of
    * a behavioral/recommendation pipeline — "user 7 did: view view cart
    * checkout"). Output per key: `n_events` (total), `seq_len`
    * (min(n_events, maxLen)), `sequence` (first `maxLen` event tokens
    * in (ts, tie) order, space-joined). The tie column must complete
    * the order (an event id) — without it, equal timestamps would make
    * the sequence nondeterministic across runs, which silently breaks
    * dedup/caching on the training side.
    *
    * Scale shape: one hash aggregate keyed by the entity;
    * `sort_array(collect_list(...))` holds ONE ENTITY's events, bounded
    * by per-entity activity (the same bound sessionization lives with),
    * never a partition's. The truncation happens after the sort inside
    * the row — array ops, no window, no second shuffle.
    */
  def eventSequences(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      eventCol: String,
      maxLen: Int): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(struct(
          col(tsCol).as("__ts"), col(tieCol).as("__tie"),
          col(eventCol).cast("string").as("__ev")))).as("__seq"))
      .select(col(keyCol), col("n_events"),
        least(col("n_events"), lit(maxLen.toLong)).as("seq_len"),
        array_join(transform(slice(col("__seq"), 1, maxLen),
          e => e.getField("__ev")), " ").as("sequence"))
  }

  /** Supervised next-event training pairs: for each event past the
    * first, emit (context = the up-to-`contextLen` PRECEDING event
    * tokens in (ts, tie) order, target = this event) — the
    * log-to-(X, y) step of a next-action / session-recommendation
    * model, where [[eventSequences]] is the unsupervised document
    * form. Output: key, pos (1-based position in the key's timeline),
    * context (space-joined, shorter near the sequence start), target.
    *
    * Scale shape: one window partitioned by the ENTITY key — state per
    * task is bounded by one entity's history (the same bound the
    * sessionizer lives with), never a global sort. `collect_list` over
    * the bounded sliding frame preserves frame order, so the context
    * string is deterministic given the total (ts, tie) order.
    */
  def nextEventPairs(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      eventCol: String,
      contextLen: Int): DataFrame = {
    require(contextLen >= 1, s"contextLen must be >= 1, got $contextLen")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.select(col(keyCol), col(tsCol), col(tieCol),
        col(eventCol).cast("string").as("__ev"))
      .withColumn("pos", row_number().over(w))
      .withColumn("context", array_join(
        collect_list(col("__ev")).over(w.rowsBetween(-contextLen, -1)), " "))
      .filter(col("pos") > 1)
      .select(col(keyCol), col("pos"), col("context"),
        col("__ev").as("target"))
  }

  /** Inter-event gap distribution — the evidence behind a session-gap
    * or watermark choice: per-key consecutive gaps in integer seconds
    * (lag over the per-key time order), then the corpus-level exact
    * quantiles plus the fraction of gaps a candidate `gapSec` would
    * split. If p90 sits near the chosen gap, sessions are being cut
    * mid-activity; if the split fraction is tiny, the gap is safely
    * conservative. One per-key window + one global aggregate over
    * gap rows; gaps stay integer seconds end to end.
    */
  def gapStats(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      gapSec: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val gaps = df
      .withColumn("__prev_us", lag(unix_micros(col(tsCol)), 1).over(w))
      .where(col("__prev_us").isNotNull)
      .select(((unix_micros(col(tsCol)) - col("__prev_us"))
        .cast("double") / 1000000.0).as("__gap_s"))
    gaps.agg(
      count(lit(1)).as("n_gaps"),
      round(expr("percentile(__gap_s, 0.5)"), 6).as("p50_s"),
      round(expr("percentile(__gap_s, 0.9)"), 6).as("p90_s"),
      round(expr("percentile(__gap_s, 0.99)"), 6).as("p99_s"),
      sum(when(col("__gap_s") > gapSec.toDouble, 1L).otherwise(0L))
        .as("n_over_gap"))
      .withColumn("split_frac",
        round(col("n_over_gap").cast("double") / col("n_gaps"), 12))
  }
}

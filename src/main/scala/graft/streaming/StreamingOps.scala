package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface (SURVEY.md §2.10 north-star extension):
  * the batch fraud features re-expressed over `readStream` sources.
  *
  *   - [[slidingVelocity]]: the 24 h velocity feature (W1) as a sliding
  *     event-time window aggregate with a watermark;
  *   - [[sessionize]]: session windows per key;
  *   - [[streamingDedup]]: `dropDuplicatesWithinWatermark` on a
  *     fingerprint — the streaming form of P4/exact-dedup;
  *   - [[velocityWithState]]: exact per-event trailing-24 h counts via
  *     `flatMapGroupsWithState` — a per-key timestamp buffer, pruned to
  *     the window horizon on every batch (bounded state).
  *
  * All operators work identically on a batch DataFrame (Spark runs the
  * same plan), which is how the specs pin stream/batch equivalence.
  */
object StreamingOps {

  /** W1 streaming: events per key per sliding window. Late data beyond
    * the watermark is dropped; state is bounded by watermark + window.
    */
  def slidingVelocity(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "user_id",
      windowLen: String = "24 hours",
      slide: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col(keyCol))
      // decimal-accumulated sum: exact and merge-order independent, so
      // stream (incremental state merge) and batch (parallel partial
      // aggregation) produce bit-identical sums
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(25,6)")).cast("double").as("sum_value"))

  /** Session windows: events grouped into per-key sessions separated by
    * `gap` of inactivity.
    */
  def sessionize(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "user_id",
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))

  /** Streaming exact-dedup: first occurrence per key set wins; duplicate
    * arrivals within the watermark horizon are dropped with bounded
    * state (the streaming form of clean_data.py:37-42).
    */
  def streamingDedup(
      events: DataFrame,
      tsCol: String,
      keys: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** The deterministic batch form of [[streamingDedup]]'s semantics:
    * per key set, keep the FIRST row in event time (tie-broken by
    * `tieBreak` for full determinism). When a stream delivers rows in
    * event-time order, `dropDuplicatesWithinWatermark` keeps exactly
    * these rows; on a batch frame the streaming operator degrades to
    * an arbitrary-row `dropDuplicates`, so pipelines that re-run over
    * history need this window form to reproduce what the stream kept.
    * One shuffle on the key columns.
    */
  def dedupFirstByTime(
      events: DataFrame,
      tsCol: String,
      keys: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    events.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  // ---- exact stateful velocity ----------------------------------------

  final case class VEvent(key: String, tsMicros: Long, eventId: Long)
  final case class VCount(key: String, eventId: Long, tsMicros: Long, n: Long)
  final case class VState(times: List[Long])

  private val WindowMicros = 86400L * 1000000L

  /** Per-key trailing-24h transaction count, exactly the batch W1
    * semantics (closed-closed frame; self excluded; same-timestamp peers
    * counted once both sides have arrived — sequential arrival means the
    * first peer of a tie does not see the second, unlike the batch RANGE
    * frame which is tie-symmetric).
    */
  def velocityFn(
      key: String,
      events: Iterator[VEvent],
      state: GroupState[VState]): Iterator[VCount] = {
    var times = state.getOption.map(_.times).getOrElse(Nil)
    val sorted = events.toSeq.sortBy(e => (e.tsMicros, e.eventId))
    val out = sorted.map { e =>
      val n = times.count(t => t >= e.tsMicros - WindowMicros && t <= e.tsMicros)
      times = e.tsMicros :: times
      VCount(key, e.eventId, e.tsMicros, n.toLong)
    }
    if (times.nonEmpty) {
      val horizon = times.max - WindowMicros
      state.update(VState(times.filter(_ >= horizon)))
    }
    out.iterator
  }

  def velocityWithState(events: Dataset[VEvent]): Dataset[VCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(velocityFn)
  }

  /** The same exact velocity on Spark 4's `transformWithState` API — a
    * `StatefulProcessor` with a `ListState[Long]` timestamp buffer,
    * pruned to the window horizon per batch. TWS is the forward-looking
    * stateful runtime (typed composite state, TTL, timers, RocksDB
    * provider); this processor uses only the list-state surface so
    * semantics match [[velocityFn]] exactly.
    */
  class VelocityProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, VEvent, VCount] {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{ListState, TimerValues, TTLConfig}

    @transient private var times: ListState[Long] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      times = getHandle.getListState[Long]("times", E.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        inputRows: Iterator[VEvent],
        timerValues: TimerValues): Iterator[VCount] = {
      var buf: List[Long] = if (times.exists()) times.get().toList else Nil
      val sorted = inputRows.toSeq.sortBy(e => (e.tsMicros, e.eventId))
      val out = sorted.map { e =>
        val n = buf.count(t => t >= e.tsMicros - WindowMicros && t <= e.tsMicros)
        buf = e.tsMicros :: buf
        VCount(key, e.eventId, e.tsMicros, n.toLong)
      }
      if (buf.nonEmpty) {
        val horizon = buf.max - WindowMicros
        times.put(buf.filter(_ >= horizon).toArray)
      }
      out.iterator
    }
  }

  def velocityWithTws(events: Dataset[VEvent]): Dataset[VCount] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .groupByKey(_.key)
      .transformWithState(
        new VelocityProcessor, TimeMode.None(), OutputMode.Append())
  }
}

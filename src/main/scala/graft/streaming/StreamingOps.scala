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

  /** Stream-stream interval join: left rows pair with same-key right
    * rows whose event time falls in
    * `[leftTs - beforeSec, leftTs + afterSec]`. The time predicate is
    * written in the `ts BETWEEN ts ± INTERVAL` shape Structured
    * Streaming requires to derive state-retention bounds from the two
    * watermarks — each side's buffered state is evicted as soon as the
    * other side's watermark passes the interval edge, so state is
    * bounded by (watermark + interval) per key, never the full stream.
    *
    * The same call works on batch frames (`withWatermark` is a no-op
    * there), which is what lets the harness oracle the join's semantics
    * in SQL while StreamingSpec proves micro-batch delivery produces
    * the identical row set.
    *
    * Column names must be disjoint apart from `keyCol` (the joined
    * frame keeps left's key column).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      beforeSec: Long,
      afterSec: Long,
      joinType: String = "inner",
      watermark: String = "1 hour"): DataFrame = {
    require(beforeSec >= 0 && afterSec >= 0,
      s"interval bounds must be >= 0, got [-$beforeSec, +$afterSec]")
    val overlap = right.columns.toSet.intersect(left.columns.toSet) - keyCol
    require(overlap.isEmpty,
      s"non-key columns must be disjoint, both sides have: ${overlap.mkString(", ")}")
    val l = left.withWatermark(leftTsCol, watermark)
    val r = right.withWatermark(rightTsCol, watermark)
    val cond = l(keyCol) === r(keyCol) &&
      r(rightTsCol) >= l(leftTsCol) - expr(s"INTERVAL $beforeSec seconds") &&
      r(rightTsCol) <= l(leftTsCol) + expr(s"INTERVAL $afterSec seconds")
    l.join(r, cond, joinType).drop(r(keyCol))
  }

  // ---- exact stateful velocity ----------------------------------------

  final case class VEvent(key: String, tsMicros: Long, eventId: Long)
  final case class VCount(key: String, eventId: Long, tsMicros: Long, n: Long)
  final case class VState(times: List[Long])

  private val WindowMicros = 86400L * 1000000L

  /** First index i in the sorted-ascending buffer with buf(i) >= x. */
  private def lowerBound(buf: scala.collection.mutable.ArrayBuffer[Long], x: Long): Int = {
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Shared counting core for both stateful runtimes: one key's batch of
    * arrivals against the sorted-ascending timestamp buffer carried in
    * state. Window membership (`t in [ts-24h, ts]`) is two binary
    * searches and each arrival inserts at its sorted position —
    * O(log b) comparisons per event where the old per-event full-buffer
    * `count` was O(b): a bot IP with 10^5 in-window events is ~10^10
    * comparisons per batch under the scan, ~10^6 here. Returns the
    * outputs and the buffer pruned to the window horizon (sorted, so the
    * next batch inherits the invariant).
    */
  private def countBatch(
      key: String,
      batch: Seq[VEvent],
      buf0: Iterable[Long]): (Seq[VCount], scala.collection.mutable.ArrayBuffer[Long]) = {
    val buf = scala.collection.mutable.ArrayBuffer.from(buf0)
    val sorted = batch.sortBy(e => (e.tsMicros, e.eventId))
    val out = sorted.map { e =>
      val lo = lowerBound(buf, e.tsMicros - WindowMicros)
      val hi = lowerBound(buf, e.tsMicros + 1L) // first index past <= ts
      buf.insert(hi, e.tsMicros)
      VCount(key, e.eventId, e.tsMicros, (hi - lo).toLong)
    }
    if (buf.nonEmpty) {
      val horizon = buf.last - WindowMicros // last = max: buf is sorted
      buf.dropInPlace(lowerBound(buf, horizon))
    }
    (out, buf)
  }

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
    // state written before the sorted-buffer invariant held newest-first
    // order — sort on read so resumed checkpoints stay correct
    val init = state.getOption.map(_.times.sorted).getOrElse(Nil)
    val (out, buf) = countBatch(key, events.toSeq, init)
    if (buf.nonEmpty) state.update(VState(buf.toList))
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
      // same defensive sort as velocityFn: pre-invariant checkpoints
      // stored the buffer newest-first
      val init: Seq[Long] = if (times.exists()) times.get().toSeq.sorted else Nil
      val (out, buf) = countBatch(key, inputRows.toSeq, init)
      if (buf.nonEmpty) times.put(buf.toArray)
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

  final case class SessEvent(key: String, ts: java.sql.Timestamp)
  final case class SessState(start: Long, last: Long, n: Long)
  final case class SessOut(key: String, start_ms: Long, end_ms: Long,
    n_events: Long)

  /** Session assembly with EVENT-TIME TIMERS — the `transformWithState`
    * feature the window-based [[sessionize]] can't express: a session
    * closes when the WATERMARK passes last-event + gap, not when a
    * window boundary happens to align. Per key the state is (start,
    * last, n); each batch folds its rows in ts order (splitting
    * in-batch gaps inline), then re-arms one timer at last + gap; the
    * timer's expiry emits the session and clears state. State is O(1)
    * per live key and every emission is driven by watermark progress —
    * the production session-timeout shape (abandoned-cart, logout
    * detection) with bounded state and late-data correctness.
    */
  class SessionTimeoutProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, SessEvent, SessOut] {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{TimerValues, TTLConfig,
      ValueState}

    @transient private var st: ValueState[SessState] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[SessState](
        "sess", E.product[SessState], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        inputRows: Iterator[SessEvent],
        timerValues: TimerValues): Iterator[SessOut] = {
      val ts = inputRows.map(_.ts.getTime).toSeq.sorted
      if (ts.isEmpty) return Iterator.empty
      val out = scala.collection.mutable.ArrayBuffer.empty[SessOut]
      var cur = if (st.exists()) st.get()
        else SessState(ts.head, ts.head, 0L)
      // clear the previously armed timer; we re-arm for the new last
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      ts.foreach { t =>
        cur = if (cur.n == 0L) SessState(t, t, 1L)
        else if (t - cur.last > gapMs) {
          out += SessOut(key, cur.start, cur.last, cur.n)
          SessState(t, t, 1L)
        } else cur.copy(last = math.max(cur.last, t), n = cur.n + 1)
      }
      st.update(cur)
      getHandle.registerTimer(cur.last + gapMs)
      out.iterator
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[SessOut] = {
      if (st.exists()) {
        val s = st.get()
        st.clear()
        if (s.n > 0) Iterator.single(SessOut(key, s.start, s.last, s.n))
        else Iterator.empty
      } else Iterator.empty
    }
  }

  /** Timer-driven sessionization over a watermarked event stream. */
  def sessionsWithTimers(
      events: Dataset[SessEvent], gapMs: Long,
      watermarkDelay: String): Dataset[SessOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .transformWithState(
        new SessionTimeoutProcessor(gapMs), TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Streaming CDC apply: maintain a keyed parquet snapshot from a
    * stream of (op, row) change events via `foreachBatch` — the
    * materialized-view maintenance loop every warehouse runs, done
    * with [[graft.operators.Merge.upsert]] per micro-batch so the
    * result is IDENTICAL to applying the batched deltas offline (the
    * spec pins stream-vs-batch equality). Each micro-batch rewrites
    * the snapshot dir; a real deployment swaps the rewrite for a
    * format with transactional row-level merge, but the merge
    * SEMANTICS — and this exact dataflow — are unchanged.
    *
    * Within one micro-batch, later ops win per key: rows carry a
    * monotonically increasing `seqCol` and only each key's max-seq
    * row applies (CDC feeds guarantee per-key order; cross-key order
    * is irrelevant).
    */
  def cdcApplySink(
      changes: DataFrame,
      snapshotDir: String,
      key: String,
      opCol: String,
      seqCol: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    changes.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(key))
          .orderBy(col(seqCol).desc)
        val lastPerKey = batch
          .withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1).drop("__rn", seqCol)
        val current =
          try spark.read.parquet(snapshotDir)
          catch { case _: Throwable =>
            lastPerKey.drop(opCol).limit(0) // first batch: empty snapshot
          }
        val next = graft.operators.Merge.upsert(
          current, lastPerKey, key, opCol)
        // rewrite via a temp dir: the read above streams from the same
        // files an in-place overwrite would delete mid-scan
        val tmp = snapshotDir + "_tmp"
        next.write.mode("overwrite").parquet(tmp)
        val fs = new org.apache.hadoop.fs.Path(snapshotDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(snapshotDir), true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(snapshotDir))
        ()
      }
      .start()
  }
}

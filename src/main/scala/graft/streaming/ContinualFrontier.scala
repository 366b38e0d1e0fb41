package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Materialize
import graft.functions.UrlFunctions
import graft.operators.Crawl

/** Continual crawl frontier: arriving URL batches are deduplicated
  * against the accumulated SEEN set (by canonical URL —
  * [[UrlFunctions.canonicalizeUrl]], so `https://WWW.h.com:443/a` and
  * `https://h.com/a` collapse), gated through the robots rule table
  * ([[Crawl.robotsDecision]]), and the survivors are scheduled with
  * per-host politeness ranks that CONTINUE across batches — the
  * serving loop a fetcher actually runs, completing the crawl family
  * next to [[ContinualAnn]]/[[ContinualDedup]]/[[ContinualPacking]].
  *
  * Semantics: a URL is new iff its canonical form was seen neither in
  * the initial frontier history nor in any STRICTLY EARLIER batch nor
  * earlier (by id) within its own batch; only new+allowed URLs are
  * scheduled, and a host's rank sequence never restarts — batch k's
  * first URL on host h fetches after every host-h URL of batches
  * < k. Verdicts are emitted for EVERY incoming row (is_dup_url,
  * allow, nullable host_rank/fetch_offset_ms) so the drop reasons
  * stay auditable.
  *
  * Scale shape per micro-batch: one canonical projection
  * (batch-sized), one anti-join against the seen set (id+canonical
  * scalars only), one broadcast rule join, one per-host window over
  * the batch, and a broadcast join against the per-host counter table
  * (host-cardinality-sized). The seen set is the state that grows —
  * on a real deployment it is a bucketed table keyed by canonical
  * hash (or a rotating Bloom front-filter with the exact table behind
  * it); host counters are tiny.
  */
object ContinualFrontier {

  final case class FrontierBatch(
      verdicts: DataFrame, seen: DataFrame, hostCounts: DataFrame)

  def foldBatch(
      seen: DataFrame,
      hostCounts: DataFrame,
      batch: DataFrame,
      idCol: String,
      urlCol: String,
      rules: DataFrame,
      delayMs: Long): FrontierBatch = {
    require(delayMs >= 0, s"delayMs must be >= 0, got $delayMs")
    // scheme-less URLs canonicalize to NULL (the q370 contract);
    // fall back to the raw string so they dedup as themselves instead
    // of all colliding on the null key
    val canon = batch.select(col(idCol), col(urlCol),
      coalesce(UrlFunctions.canonicalizeUrl(col(urlCol)), col(urlCol))
        .as("__canon"))
    // within-batch first occurrence by id, then the cross-batch set
    val wc = Window.partitionBy(col("__canon")).orderBy(col(idCol))
    val marked = canon
      .withColumn("__first", row_number().over(wc) === 1)
      .join(seen.select(col("__canon"), lit(true).as("__seen")),
        Seq("__canon"), "left")
      .withColumn("is_dup_url", !col("__first") || col("__seen").isNotNull)
    val dec = Crawl.robotsDecision(
      marked.filter(!col("is_dup_url")), idCol, urlCol, rules)
      .select(col(idCol), col("host"), col("allow"))
    val wh = Window.partitionBy(col("host")).orderBy(col(idCol))
    val sched = dec.filter(col("allow"))
      .join(broadcast(hostCounts), Seq("host"), "left")
      .withColumn("host_rank",
        (row_number().over(wh) + coalesce(col("__n"), lit(0L)))
          .cast("long"))
      .withColumn("fetch_offset_ms", (col("host_rank") - 1L) * delayMs)
      .select(col(idCol), col("host_rank"), col("fetch_offset_ms"))
    val verdicts = Materialize.cut(marked
      .join(dec.select(col(idCol), col("host"), col("allow")),
        Seq(idCol), "left")
      .join(sched, Seq(idCol), "left")
      .select(col(idCol), col(urlCol), col("is_dup_url"),
        col("host"), col("allow"), col("host_rank"),
        col("fetch_offset_ms")))
    val newSeen = Materialize.cut(seen.select(col("__canon")).unionByName(
      marked.filter(col("__first") && col("__seen").isNull)
        .select(col("__canon"))))
    val newCounts = Materialize.cut(
      hostCounts.select(col("host"), col("__n"))
        .unionByName(verdicts.filter(col("host_rank").isNotNull)
          .groupBy(col("host")).agg(count(lit(1)).as("__n")))
        .groupBy(col("host")).agg(sum(col("__n")).as("__n")))
    FrontierBatch(verdicts, newSeen, newCounts)
  }

  /** Deterministic batch-mode replay: fold [[foldBatch]] over an
    * ordered batch sequence from an empty history. Output: every
    * incoming row as (idCol, urlCol, batch_id, is_dup_url, host,
    * allow, host_rank, fetch_offset_ms) — host/allow are null for
    * dropped duplicates, host_rank/fetch_offset_ms null for
    * robots-denied rows. The streaming entry [[start]] emits exactly
    * these rows for the same batches in order.
    */
  def replayBatches(
      batches: Seq[DataFrame],
      idCol: String,
      urlCol: String,
      rules: DataFrame,
      delayMs: Long): DataFrame = {
    require(batches.nonEmpty, "replayBatches: need at least one batch")
    val spark = rules.sparkSession
    var seen = emptySeen(spark)
    var counts = emptyCounts(spark)
    val out = batches.zipWithIndex.map { case (b, i) =>
      val r = foldBatch(seen, counts, b, idCol, urlCol, rules, delayMs)
      seen = r.seen
      counts = r.hostCounts
      r.verdicts.withColumn("batch_id", lit(i.toLong))
        .select(col(idCol), col(urlCol), col("batch_id"),
          col("is_dup_url"), col("host"), col("allow"),
          col("host_rank"), col("fetch_offset_ms"))
    }
    out.reduce(_.unionByName(_))
  }

  /** The streaming entry: `foreachBatch` folds each arriving URL
    * micro-batch against the accumulated (seen, host-counter) state
    * and hands the verdict frame (with its `batch_id`) to `onBatch`.
    * At-least-once guard: re-delivered batch ids are SKIPPED — a
    * double fold would mark the whole batch duplicate and advance no
    * ranks, but the verdicts would be emitted twice.
    */
  def start(
      incoming: DataFrame,
      idCol: String,
      urlCol: String,
      rules: DataFrame,
      delayMs: Long,
      queryName: String = "continual_frontier")(
      onBatch: DataFrame => Unit): StreamingQuery =
    incoming.writeStream
      .queryName(queryName)
      .foreachBatch(batchStep(idCol, urlCol, rules, delayMs)(onBatch))
      .start()

  /** The stateful `foreachBatch` step [[start]] installs — exposed at
    * package scope for the re-delivery guard spec.
    */
  private[graft] def batchStep(
      idCol: String,
      urlCol: String,
      rules: DataFrame,
      delayMs: Long)(
      onBatch: DataFrame => Unit): (DataFrame, Long) => Unit = {
    val spark = rules.sparkSession
    var seen = emptySeen(spark)
    var counts = emptyCounts(spark)
    var lastMerged = -1L
    (batch, batchId) =>
      if (batchId > lastMerged) {
        val r = foldBatch(seen, counts, batch, idCol, urlCol, rules,
          delayMs)
        seen = r.seen
        counts = r.hostCounts
        lastMerged = batchId
        onBatch(r.verdicts.withColumn("batch_id", lit(batchId))
          .select(col(idCol), col(urlCol), col("batch_id"),
            col("is_dup_url"), col("host"), col("allow"),
            col("host_rank"), col("fetch_offset_ms")))
      }
  }

  private def emptySeen(
      spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.range(0).select(lit("").as("__canon")).filter(lit(false))

  private def emptyCounts(
      spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.range(0).select(lit("").as("host"), lit(0L).as("__n"))
      .filter(lit(false))
}

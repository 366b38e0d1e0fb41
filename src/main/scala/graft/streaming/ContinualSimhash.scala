package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Materialize
import graft.functions.TextFunctions
import graft.operators.TextDedup

/** Continual-crawl SIMHASH near-dup detection: arriving document
  * batches probe the ACCUMULATED signature table
  * ([[TextDedup.simhashNearDupPairsAgainstIndex]]); non-duplicate
  * survivors' signatures fold in and become corpus for every later
  * batch — the third and last dedup family's `foreachBatch` twin
  * ([[ContinualMinhash]] = probabilistic set similarity,
  * [[ContinualWinnow]] = guaranteed shared-run detection, this =
  * Hamming distance over 60/64-bit fingerprints), completing the
  * batch / persisted / continual 3×3 for all three families. On a
  * real deployment the in-memory signature frame is the parquet index
  * ([[TextDedup.saveSimhashIndex]] /
  * [[TextDedup.appendToSimhashIndex]]) — same plan shape, state on
  * object storage, and the SMALLEST state of the three (8 bytes per
  * corpus document; banding is a free projection re-derived at probe
  * time).
  *
  * Scale shape per micro-batch: only the BATCH is signed (the corpus
  * never re-signs — the point of the index); candidates come from
  * band-key equality over the accumulated signatures, the verify is a
  * single xor/popcount per candidate pair, and the index grows by the
  * batch survivors' 8-byte rows. State crosses triggers through
  * [[Materialize.cut]].
  *
  * Batch ordering is the semantics (the [[ContinualMinhash]]
  * contract): a document is a duplicate iff the initial corpus or a
  * STRICTLY EARLIER batch's survivor sits within `maxHamming`;
  * within-batch duplicates are not collapsed, so the flow replays
  * deterministically given the batch split ([[replayBatches]]).
  */
object ContinualSimhash {

  /** One checked batch: incoming rows with verdicts (idCol, is_dup,
    * matched_id — the smallest matching corpus id, null when new),
    * plus the grown signature table (id, sig).
    */
  final case class CheckedBatch(checked: DataFrame, index: DataFrame)

  private def signatures(
      df: DataFrame, textCol: String, idCol: String,
      hashFn: Column => Column, bits: Int): DataFrame =
    TextDedup.simhashSignatures(df, textCol, idCol, hashFn, bits)
      .select(col(idCol).as("id"), col("sig"))

  def checkAndAppend(
      index: DataFrame,
      batch: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 8,
      hashFn: Column => Column = TextFunctions.md5Hash60,
      bits: Int = 60): CheckedBatch = {
    val hits = TextDedup.simhashNearDupPairsAgainstIndex(
      index, batch, textCol, idCol, maxHamming, hashFn, bits)
      .groupBy(col("id_b").as("__id"))
      .agg(min(col("id_a")).as("matched_id"))
    val checked = Materialize.cut(
      batch.select(col(idCol))
        .join(hits, col(idCol) === col("__id"), "left")
        .select(col(idCol), col("matched_id").isNotNull.as("is_dup"),
          col("matched_id")))
    val survivors = batch
      .join(checked.filter(!col("is_dup")).select(col(idCol)), Seq(idCol))
    CheckedBatch(checked,
      Materialize.cut(index.unionByName(
        signatures(survivors, textCol, idCol, hashFn, bits))))
  }

  /** Deterministic batch-mode replay of the stream: fold
    * [[checkAndAppend]] over an ordered batch sequence from the
    * initial corpus' signatures. Output: every incoming row as
    * (idCol, batch_id, is_dup, matched_id). The streaming entry
    * [[start]] produces exactly these rows for the same batch split —
    * pinned by the StreamingSpec MemoryStream equivalence test.
    */
  def replayBatches(
      corpus0: DataFrame,
      batches: Seq[DataFrame],
      textCol: String,
      idCol: String,
      maxHamming: Int = 8,
      hashFn: Column => Column = TextFunctions.md5Hash60,
      bits: Int = 60): DataFrame = {
    require(batches.nonEmpty, "replayBatches: need at least one batch")
    var ix = Materialize.cut(
      signatures(corpus0, textCol, idCol, hashFn, bits))
    val checked = batches.zipWithIndex.map { case (b, i) =>
      val r = checkAndAppend(ix, b, textCol, idCol, maxHamming, hashFn,
        bits)
      ix = r.index
      r.checked.select(col(idCol), lit(i.toLong).as("batch_id"),
        col("is_dup"), col("matched_id"))
    }
    checked.reduce(_.unionByName(_))
  }

  /** The streaming entry: `foreachBatch` routes each arriving
    * micro-batch through [[checkAndAppend]] against the accumulated
    * signatures and hands the verdict frame (with `batch_id`) to
    * `onBatch`. At-least-once guard: growing the index twice for one
    * batch id is NOT idempotent (the second delivery would self-match
    * against the first), so re-delivered ids are skipped.
    */
  def start(
      incoming: DataFrame,
      corpus0: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 8,
      hashFn: Column => Column = TextFunctions.md5Hash60,
      bits: Int = 60,
      queryName: String = "continual_simhash_dedup")(
      onBatch: DataFrame => Unit): StreamingQuery =
    incoming.writeStream
      .queryName(queryName)
      .foreachBatch(batchStep(corpus0, textCol, idCol, maxHamming,
        hashFn, bits)(onBatch))
      .start()

  private[graft] def batchStep(
      corpus0: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int,
      hashFn: Column => Column,
      bits: Int)(
      onBatch: DataFrame => Unit): (DataFrame, Long) => Unit = {
    var ix: DataFrame = null
    var lastMerged = -1L
    (batch, batchId) =>
      if (batchId > lastMerged) {
        if (ix == null)
          ix = Materialize.cut(
            signatures(corpus0, textCol, idCol, hashFn, bits))
        val r = checkAndAppend(ix, batch, textCol, idCol, maxHamming,
          hashFn, bits)
        ix = r.index
        lastMerged = batchId
        onBatch(r.checked.select(lit(batchId).as("batch_id"),
          col(idCol), col("is_dup"), col("matched_id")))
      }
  }
}

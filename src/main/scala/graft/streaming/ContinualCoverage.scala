package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Continual tokenizer-coverage audit: every arriving document batch
  * is measured against the FROZEN persisted WordPiece vocabulary
  * ([[graft.operators.TokenizerStore.loadWordpieceVocab]] →
  * [[TextAnalysis.wordpieceCoverage]]) — per-batch, per-group
  * occurrence-weighted OOV rate and fertility, the production
  * RE-TRAIN TRIGGER signal: a vocabulary trained on yesterday's
  * corpus drifts as new sources/snapshots arrive, and the first
  * operational question is "which arriving slice does the frozen
  * vocab serve badly, and since when". The batch twin is q443; this
  * is its `foreachBatch` deployment shape, completing the continual
  * family (minhash [[ContinualMinhash]], semantic [[ContinualDedup]],
  * ANN [[ContinualAnn]], frontier [[ContinualFrontier]]).
  *
  * Unlike the dedup streams there is NO accumulated state — the
  * vocabulary is deliberately frozen (that is what makes drift
  * measurable), so batches are independent and the only cross-trigger
  * concern is the at-least-once guard: a re-delivered batch id must
  * not re-emit its rows (downstream dashboards sum them).
  *
  * Scale shape per micro-batch: segmentation runs on the batch's
  * DISTINCT word table, the vocabulary join broadcasts, output is
  * group-cardinality — the stream's cost scales with arriving tokens
  * only, never with corpus history.
  */
object ContinualCoverage {

  private def withBatchId(cov: DataFrame, batchId: Long): DataFrame =
    cov.select(lit(batchId).as("batch_id"), col("group_key"),
      col("n_words"), col("n_unk"), col("oov_rate"), col("mean_pieces"))

  /** Deterministic batch-mode replay of the stream: coverage of each
    * batch in order under the frozen vocab. Output: one row per
    * (batch_id, group_key). The streaming entry [[start]] produces
    * exactly these rows for the same batch split — pinned by the
    * StreamingSpec MemoryStream equivalence test.
    */
  def replayBatches(
      vocab: DataFrame,
      batches: Seq[DataFrame],
      textCol: String,
      groupCol: String): DataFrame = {
    require(batches.nonEmpty, "replayBatches: need at least one batch")
    batches.zipWithIndex.map { case (b, i) =>
      withBatchId(
        TextAnalysis.wordpieceCoverage(b, textCol, groupCol, vocab),
        i.toLong)
    }.reduce(_.unionByName(_))
  }

  /** The streaming entry: `foreachBatch` measures each arriving
    * micro-batch's coverage under the frozen vocab and hands the
    * per-group frame (with `batch_id`) to `onBatch`. Re-delivered
    * batch ids are skipped (at-least-once guard).
    */
  def start(
      incoming: DataFrame,
      vocab: DataFrame,
      textCol: String,
      groupCol: String,
      queryName: String = "continual_tokenizer_coverage")(
      onBatch: DataFrame => Unit): StreamingQuery =
    incoming.writeStream
      .queryName(queryName)
      .foreachBatch(batchStep(vocab, textCol, groupCol)(onBatch))
      .start()

  private[graft] def batchStep(
      vocab: DataFrame,
      textCol: String,
      groupCol: String)(
      onBatch: DataFrame => Unit): (DataFrame, Long) => Unit = {
    var lastSeen = -1L
    (batch, batchId) =>
      if (batchId > lastSeen) {
        lastSeen = batchId
        onBatch(withBatchId(
          TextAnalysis.wordpieceCoverage(batch, textCol, groupCol, vocab),
          batchId))
      }
  }
}

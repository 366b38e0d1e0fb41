package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Materialize
import graft.operators.Similarity

/** Continual-crawl semantic dedup: arriving embedding batches route
  * through the explicit centroid index against the ACCUMULATED corpus
  * ([[Similarity.semanticDedupAgainst]]); survivors append and become
  * corpus for every later batch. This is the serving twin of the batch
  * incremental dedup (q112) — the shape a crawler actually runs: the
  * corpus only ever grows by what was genuinely new.
  *
  * Scale shape: each micro-batch costs one cell-equi candidate join
  * (|batch-in-cell| x |corpus-in-cell|, never |batch| x |corpus|) plus
  * the decimal-exact verify on candidates only — identical to the batch
  * operator, because it IS the batch operator under `foreachBatch`. The
  * corpus state crosses batches through [[Materialize.cut]] (reliable
  * `checkpoint()` on clusters via `spark.graft.reliableCheckpoint`), so
  * lineage stays bounded no matter how long the stream runs; on a real
  * deployment the union-append becomes an append to a corpus table
  * (parquet/Delta) with the same plan shape.
  *
  * Batch ordering is the semantics: a vector is a duplicate iff some
  * vector in the initial corpus OR a survivor of a STRICTLY EARLIER
  * batch matches it (same assigned cell, cosine >= threshold).
  * Within-batch duplicates are deliberately not collapsed — the
  * documented [[Similarity.semanticDedupAgainst]] contract — so the
  * whole flow replays deterministically given the batch split, which is
  * what [[replayBatches]] does and what the q334 oracle re-derives in
  * SQL.
  */
object ContinualDedup {

  /** One checked batch: incoming rows with verdicts
    * (idCol, cell, is_dup, matched_id), plus the corpus to carry
    * forward (old corpus + this batch's survivors). Both sides are
    * materialized: the verdicts because a streaming micro-batch frame
    * is only valid inside its trigger, the corpus to cut lineage.
    */
  final case class CheckedBatch(checked: DataFrame, corpus: DataFrame)

  def checkAndAppend(
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      threshold: Double,
      dim: Int = 64): CheckedBatch = {
    val checked = Materialize.cut(
      Similarity.semanticDedupAgainst(
        corpus, batch, idCol, vecCol, centroids, threshold, dim))
    val survivors = batch
      .join(checked.filter(!col("is_dup")).select(col(idCol)), Seq(idCol))
      .select(col(idCol), col(vecCol))
    CheckedBatch(checked, Materialize.cut(corpus.union(survivors)))
  }

  /** Deterministic batch-mode replay of the stream: fold
    * [[checkAndAppend]] over an ordered batch sequence. Output: every
    * incoming row as (idCol, batch_id, cell, is_dup, matched_id).
    * The streaming entry [[start]] produces exactly these rows when fed
    * the same batches in the same order — pinned by the StreamingSpec
    * MemoryStream equivalence test.
    */
  def replayBatches(
      corpus0: DataFrame,
      batches: Seq[DataFrame],
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      threshold: Double,
      dim: Int = 64): DataFrame = {
    require(batches.nonEmpty, "replayBatches: need at least one batch")
    var corpus = Materialize.cut(corpus0.select(col(idCol), col(vecCol)))
    val checked = batches.zipWithIndex.map { case (b, i) =>
      val r = checkAndAppend(corpus, b, idCol, vecCol, centroids,
        threshold, dim)
      corpus = r.corpus
      r.checked.select(col(idCol), lit(i.toLong).as("batch_id"),
        col("cell"), col("is_dup"), col("matched_id"))
    }
    checked.reduce(_.unionByName(_))
  }

  /** The streaming entry: `foreachBatch` routes each arriving
    * micro-batch through [[checkAndAppend]] against the accumulated
    * corpus and hands the verdict frame (with its `batch_id`) to
    * `onBatch` — typically an append sink. State crosses triggers in
    * the materialized `corpus` var, exactly the [[replayBatches]] fold.
    *
    * At-least-once guard: `foreachBatch` may re-deliver a batch id
    * after a transient failure, and appending a batch's survivors to
    * the corpus twice is NOT idempotent (the second delivery would
    * self-match against the first). The closure tracks the last
    * appended batch id and SKIPS re-delivered ids, keeping the corpus
    * equal to the [[replayBatches]] fold; restart-survivable state
    * would move the corpus into a checkpointed state store — this
    * entry is the single-process serving shape.
    */
  def start(
      incoming: DataFrame,
      corpus0: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      threshold: Double,
      dim: Int = 64,
      queryName: String = "continual_semantic_dedup")(
      onBatch: DataFrame => Unit): StreamingQuery =
    incoming.writeStream
      .queryName(queryName)
      .foreachBatch(batchStep(corpus0, idCol, vecCol, centroids,
        threshold, dim)(onBatch))
      .start()

  /** The stateful `foreachBatch` step [[start]] installs — exposed at
    * package scope so the at-least-once guard is directly testable
    * (the spec re-delivers a batch id and asserts no double append).
    */
  private[graft] def batchStep(
      corpus0: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      threshold: Double,
      dim: Int)(
      onBatch: DataFrame => Unit): (DataFrame, Long) => Unit = {
    var corpus = Materialize.cut(corpus0.select(col(idCol), col(vecCol)))
    var lastMerged = -1L
    (batch, batchId) =>
      if (batchId > lastMerged) {
        val r = checkAndAppend(corpus, batch, idCol, vecCol, centroids,
          threshold, dim)
        corpus = r.corpus
        lastMerged = batchId
        onBatch(r.checked.select(col(idCol), lit(batchId).as("batch_id"),
          col("cell"), col("is_dup"), col("matched_id")))
      }
  }
}

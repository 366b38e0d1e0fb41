package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Materialize
import graft.operators.Similarity

/** Continual ANN-index maintenance: arriving embedding batches are
  * assigned against the CURRENT centroids ([[Similarity.ivfAssign]]),
  * appended to the accumulated membership, drift-checked
  * ([[Similarity.ivfDriftTrigger]]), and any drifting cell is
  * re-centroided from its full accumulated membership
  * ([[Similarity.ivfRecentroid]]) before the next batch arrives. This
  * is the serving twin of the batch fold (q400's `ivfAppendBatch`) —
  * it completes the continual-crawl story next to [[ContinualDedup]],
  * [[ContinualPacking]] and `incrementalComponents`: the index now
  * GROWS and REPAIRS without ever re-clustering the corpus.
  *
  * Semantics (the append-only index contract): a vector's cell is
  * fixed at ARRIVAL TIME by the centroids as they stood when its batch
  * was folded; re-centroiding moves the quantizer point for FUTURE
  * batches only, never re-buckets history. Drift compares each batch's
  * per-cell mean against the current centroid; cells above `threshold`
  * re-centroid from ALL their members so far (initial corpus + every
  * folded batch), per-dim decimal means rounded at 12 dp — the
  * iterative-mean discipline that keeps the evolving centroids
  * bit-replayable in SQL (the q406 oracle unrolls the rounds).
  *
  * Scale shape per micro-batch: one broadcast-centroid assignment of
  * the batch (batch-sized), one (cell, dim) drift aggregate
  * (batch-sized), and a re-centroid aggregate over ONLY the flagged
  * cells' membership — the corpus is touched cell-wise, never
  * re-scanned whole. Membership state crosses batches through
  * [[Materialize.cut]]; on a real deployment it is the persisted
  * `assign` parquet next to the index ([[Similarity.saveAssignments]])
  * and the re-centroid reads just the flagged cells' partitions.
  */
object ContinualAnn {

  /** One folded batch: the batch's assignments (idCol, cell), the
    * centroids to serve the NEXT batch (possibly re-centroided), and
    * the accumulated membership (idCol, vecCol, cell). All three are
    * materialized — a streaming micro-batch frame is only valid inside
    * its trigger, and the two state frames must cut lineage.
    */
  final case class FoldedBatch(
      assigned: DataFrame, centroids: DataFrame, members: DataFrame)

  def foldBatch(
      members: DataFrame,
      centroids: DataFrame,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): FoldedBatch = {
    val assigned = Materialize.cut(
      Similarity.ivfAssign(batch, idCol, vecCol, centroids)
        .select(col(idCol), col("cell")))
    val grown = Materialize.cut(members.unionByName(
      assigned.join(batch.select(col(idCol), col(vecCol)), Seq(idCol))
        .select(col(idCol), col(vecCol), col("cell"))))
    val flagged = Similarity
      .ivfDriftTrigger(batch, idCol, vecCol, centroids, threshold)
      .filter(col("needs_recentroid"))
    val nextCentroids = Materialize.cut(Similarity.ivfRecentroid(
      grown.select(col(idCol), col(vecCol)), idCol, vecCol,
      grown.select(col(idCol), col("cell")), centroids, flagged))
    FoldedBatch(assigned, nextCentroids, grown)
  }

  /** Deterministic batch-mode replay of the stream: fold [[foldBatch]]
    * over an ordered batch sequence starting from the loaded index
    * state (corpus vectors + their assignments + centroids). Output:
    * every arriving row as (idCol, batch_id, cell). The streaming
    * entry [[start]] produces exactly these rows when fed the same
    * batches in the same order — pinned by the StreamingSpec
    * MemoryStream equivalence test; the q406 oracle re-derives the
    * whole evolution in SQL.
    */
  def replayBatches(
      corpusVecs: DataFrame,
      corpusAssign: DataFrame,
      centroids0: DataFrame,
      batches: Seq[DataFrame],
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    require(batches.nonEmpty, "replayBatches: need at least one batch")
    var members = Materialize.cut(
      corpusAssign.select(col(idCol), col("cell"))
        .join(corpusVecs.select(col(idCol), col(vecCol)), Seq(idCol))
        .select(col(idCol), col(vecCol), col("cell")))
    var centroids = Materialize.cut(
      centroids0.select(col("cell"), col("cvec")))
    val out = batches.zipWithIndex.map { case (b, i) =>
      val r = foldBatch(members, centroids, b, idCol, vecCol, threshold)
      members = r.members
      centroids = r.centroids
      r.assigned.select(col(idCol), lit(i.toLong).as("batch_id"),
        col("cell"))
    }
    out.reduce(_.unionByName(_))
  }

  /** The final centroid table after replaying `batches` — the replay's
    * other output, for persisting back with [[Similarity.saveIndex]]
    * and for the spec's drift-vs-frozen assertions.
    */
  def replayCentroids(
      corpusVecs: DataFrame,
      corpusAssign: DataFrame,
      centroids0: DataFrame,
      batches: Seq[DataFrame],
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    var members = Materialize.cut(
      corpusAssign.select(col(idCol), col("cell"))
        .join(corpusVecs.select(col(idCol), col(vecCol)), Seq(idCol))
        .select(col(idCol), col(vecCol), col("cell")))
    var centroids = Materialize.cut(
      centroids0.select(col("cell"), col("cvec")))
    batches.foreach { b =>
      val r = foldBatch(members, centroids, b, idCol, vecCol, threshold)
      members = r.members
      centroids = r.centroids
    }
    centroids
  }

  /** The streaming entry: `foreachBatch` folds each arriving
    * micro-batch through [[foldBatch]] against the accumulated
    * (members, centroids) state and hands the assignment frame (with
    * its `batch_id`) to `onBatch` — typically the index's assign-table
    * append. At-least-once guard: re-delivered batch ids are SKIPPED
    * (appending a batch's members twice would double-weight every
    * later re-centroid mean), keeping the state equal to the
    * [[replayBatches]] fold.
    */
  def start(
      incoming: DataFrame,
      corpusVecs: DataFrame,
      corpusAssign: DataFrame,
      centroids0: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      queryName: String = "continual_ann_index")(
      onBatch: DataFrame => Unit): StreamingQuery =
    incoming.writeStream
      .queryName(queryName)
      .foreachBatch(batchStep(corpusVecs, corpusAssign, centroids0,
        idCol, vecCol, threshold)(onBatch))
      .start()

  /** The stateful `foreachBatch` step [[start]] installs — exposed at
    * package scope so the at-least-once guard is directly testable
    * (the spec re-delivers a batch id and asserts no double fold).
    */
  private[graft] def batchStep(
      corpusVecs: DataFrame,
      corpusAssign: DataFrame,
      centroids0: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double)(
      onBatch: DataFrame => Unit): (DataFrame, Long) => Unit = {
    var members = Materialize.cut(
      corpusAssign.select(col(idCol), col("cell"))
        .join(corpusVecs.select(col(idCol), col(vecCol)), Seq(idCol))
        .select(col(idCol), col(vecCol), col("cell")))
    var centroids = Materialize.cut(
      centroids0.select(col("cell"), col("cvec")))
    var lastMerged = -1L
    (batch, batchId) =>
      if (batchId > lastMerged) {
        val r = foldBatch(members, centroids, batch, idCol, vecCol,
          threshold)
        members = r.members
        centroids = r.centroids
        lastMerged = batchId
        onBatch(r.assigned.select(col(idCol),
          lit(batchId).as("batch_id"), col("cell")))
      }
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Materialize
import graft.operators.TextDedup

/** Continual-crawl EXACT-RECALL overlap detection: arriving document
  * batches probe the ACCUMULATED winnowing fingerprint index
  * ([[TextDedup.winnowOverlapAgainstIndex]]); non-overlapping
  * survivors' fingerprint rows fold into the index and become corpus
  * for every later batch — the winnowing twin of [[ContinualMinhash]]
  * (probabilistic whole-document similarity there, guaranteed
  * shared-run detection here: any shared token run >= w + k - 1 with
  * anything already ingested fires). On a real deployment the
  * in-memory index frame is the parquet index
  * ([[TextDedup.saveWinnowIndex]] / [[TextDedup.appendToWinnowIndex]])
  * — same plan shape, state on object storage.
  *
  * Scale shape per micro-batch: only the BATCH is fingerprinted (the
  * corpus never re-fingerprints — the point of the index); the
  * boilerplate df-prune runs at probe time over the accumulated
  * posting lists, so it stays correct as the corpus grows (the
  * [[TextDedup.saveWinnowIndex]] argument); state crosses triggers
  * through [[Materialize.cut]].
  *
  * Batch ordering is the semantics ([[ContinualMinhash]]'s contract):
  * a document overlaps iff the initial corpus or a STRICTLY EARLIER
  * batch's survivor shares >= minShared pruned fingerprints;
  * within-batch overlaps are not collapsed, so the flow replays
  * deterministically given the batch split ([[replayBatches]]).
  */
object ContinualWinnow {

  /** One checked batch: incoming rows with verdicts (idCol,
    * is_overlap, matched_id — the smallest overlapping corpus id,
    * null when new), plus the grown fingerprint index (id, pos, fp).
    */
  final case class CheckedBatch(checked: DataFrame, index: DataFrame)

  def checkAndAppend(
      index: DataFrame,
      batch: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 3,
      w: Int = 4,
      minShared: Int = 3,
      maxDf: Int = 50): CheckedBatch = {
    val hits = TextDedup.winnowOverlapAgainstIndex(
      index, batch, textCol, idCol, k, w, minShared, maxDf)
      .groupBy(col("new_id").as("__id"))
      .agg(min(col("corpus_id")).as("matched_id"))
    val checked = Materialize.cut(
      batch.select(col(idCol))
        .join(hits, col(idCol) === col("__id"), "left")
        .select(col(idCol), col("matched_id").isNotNull.as("is_overlap"),
          col("matched_id")))
    val survivors = batch
      .join(checked.filter(!col("is_overlap")).select(col(idCol)),
        Seq(idCol))
    val grownRows = TextDedup.winnowFingerprints(
      survivors, textCol, idCol, k, w)
      .select(col(idCol).as("id"), col("pos"), col("fp"))
    CheckedBatch(checked,
      Materialize.cut(index.unionByName(grownRows)))
  }

  /** Deterministic batch-mode replay of the stream: fold
    * [[checkAndAppend]] over an ordered batch sequence from the
    * initial corpus' fingerprints. Output: every incoming row as
    * (idCol, batch_id, is_overlap, matched_id). The streaming entry
    * [[start]] produces exactly these rows for the same batch split —
    * pinned by the StreamingSpec MemoryStream equivalence test.
    */
  def replayBatches(
      corpus0: DataFrame,
      batches: Seq[DataFrame],
      textCol: String,
      idCol: String,
      k: Int = 3,
      w: Int = 4,
      minShared: Int = 3,
      maxDf: Int = 50): DataFrame = {
    require(batches.nonEmpty, "replayBatches: need at least one batch")
    var ix = Materialize.cut(
      TextDedup.winnowFingerprints(corpus0, textCol, idCol, k, w)
        .select(col(idCol).as("id"), col("pos"), col("fp")))
    val checked = batches.zipWithIndex.map { case (b, i) =>
      val r = checkAndAppend(ix, b, textCol, idCol, k, w, minShared,
        maxDf)
      ix = r.index
      r.checked.select(col(idCol), lit(i.toLong).as("batch_id"),
        col("is_overlap"), col("matched_id"))
    }
    checked.reduce(_.unionByName(_))
  }

  /** The streaming entry: `foreachBatch` routes each arriving
    * micro-batch through [[checkAndAppend]] against the accumulated
    * index and hands the verdict frame (with `batch_id`) to
    * `onBatch`. At-least-once guard: growing the index twice for one
    * batch id is NOT idempotent (the second delivery would self-match
    * against the first), so re-delivered ids are skipped.
    */
  def start(
      incoming: DataFrame,
      corpus0: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 3,
      w: Int = 4,
      minShared: Int = 3,
      maxDf: Int = 50,
      queryName: String = "continual_winnow_overlap")(
      onBatch: DataFrame => Unit): StreamingQuery =
    incoming.writeStream
      .queryName(queryName)
      .foreachBatch(batchStep(corpus0, textCol, idCol, k, w, minShared,
        maxDf)(onBatch))
      .start()

  private[graft] def batchStep(
      corpus0: DataFrame,
      textCol: String,
      idCol: String,
      k: Int,
      w: Int,
      minShared: Int,
      maxDf: Int)(
      onBatch: DataFrame => Unit): (DataFrame, Long) => Unit = {
    var ix: DataFrame = null
    var lastMerged = -1L
    (batch, batchId) =>
      if (batchId > lastMerged) {
        if (ix == null)
          ix = Materialize.cut(
            TextDedup.winnowFingerprints(corpus0, textCol, idCol, k, w)
              .select(col(idCol).as("id"), col("pos"), col("fp")))
        val r = checkAndAppend(ix, batch, textCol, idCol, k, w,
          minShared, maxDf)
        ix = r.index
        lastMerged = batchId
        onBatch(r.checked.select(lit(batchId).as("batch_id"),
          col(idCol), col("is_overlap"), col("matched_id")))
      }
  }
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Materialize
import graft.functions.TextFunctions
import graft.operators.TextDedup
import graft.operators.TextDedup.MinhashIndex

/** Continual-crawl NEAR-DUP dedup over text: arriving document batches
  * probe the ACCUMULATED minhash-LSH index
  * ([[TextDedup.minhashNearDupPairsAgainstIndex]]); survivors' band
  * and shingle rows fold into the index and become corpus for every
  * later batch — the text twin of [[ContinualDedup]] (semantic /
  * embedding space), completing the continual family for the dedup
  * side. On a real deployment the in-memory index frames are the
  * parquet index ([[TextDedup.saveMinhashIndex]] /
  * [[TextDedup.appendToMinhashIndex]]) — same plan shape, the state
  * just lives on object storage instead of executor blocks.
  *
  * Scale shape per micro-batch: the batch alone is shingled and
  * signed (the corpus never re-signs — that is the entire point of
  * the index); candidates come from band-key collisions, the exact
  * Jaccard verify joins stored shingle rows of CANDIDATE ids only,
  * and the index grows by the batch's survivors. State crosses
  * triggers through [[Materialize.cut]], so lineage stays bounded for
  * arbitrarily long streams.
  *
  * Batch ordering is the semantics: a document is a duplicate iff
  * some document in the initial corpus OR a survivor of a STRICTLY
  * EARLIER batch matches it (jaccard >= threshold). Within-batch
  * duplicates are deliberately not collapsed — the
  * [[ContinualDedup]] contract — so the flow replays
  * deterministically given the batch split ([[replayBatches]], which
  * the q441 oracle re-derives in SQL).
  */
object ContinualMinhash {

  /** One checked batch: incoming rows with verdicts
    * (idCol, is_dup, matched_id — the smallest matching corpus id,
    * null when new), plus the grown index to carry forward.
    */
  final case class CheckedBatch(checked: DataFrame, index: MinhashIndex)

  def checkAndAppend(
      index: MinhashIndex,
      batch: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      numHashes: Int = 16,
      bands: Int = 8,
      threshold: Double = 0.8,
      hashFn: Column => Column = TextFunctions.md5Hash60): CheckedBatch = {
    val hits = TextDedup.minhashNearDupPairsAgainstIndex(
      index, batch, textCol, idCol, n, numHashes, bands, threshold,
      hashFn)
      .groupBy(col("id_b").as("__id"))
      .agg(min(col("id_a")).as("matched_id"))
    val checked = Materialize.cut(
      batch.select(col(idCol))
        .join(hits, col(idCol) === col("__id"), "left")
        .select(col(idCol), col("matched_id").isNotNull.as("is_dup"),
          col("matched_id")))
    val survivors = batch
      .join(checked.filter(!col("is_dup")).select(col(idCol)), Seq(idCol))
    val grown = TextDedup.buildMinhashIndex(
      survivors, textCol, idCol, n, numHashes, bands, hashFn)
    CheckedBatch(checked, MinhashIndex(
      Materialize.cut(index.bands.unionByName(grown.bands)),
      Materialize.cut(index.shingles.unionByName(grown.shingles))))
  }

  /** Deterministic batch-mode replay of the stream: fold
    * [[checkAndAppend]] over an ordered batch sequence from the
    * initial corpus' index. Output: every incoming row as
    * (idCol, batch_id, is_dup, matched_id). The streaming entry
    * [[start]] produces exactly these rows for the same batch split —
    * pinned by the StreamingSpec MemoryStream equivalence test.
    */
  def replayBatches(
      corpus0: DataFrame,
      batches: Seq[DataFrame],
      textCol: String,
      idCol: String,
      n: Int = 3,
      numHashes: Int = 16,
      bands: Int = 8,
      threshold: Double = 0.8,
      hashFn: Column => Column = TextFunctions.md5Hash60): DataFrame = {
    require(batches.nonEmpty, "replayBatches: need at least one batch")
    val ix0 = TextDedup.buildMinhashIndex(corpus0, textCol, idCol, n,
      numHashes, bands, hashFn)
    var ix = MinhashIndex(Materialize.cut(ix0.bands),
      Materialize.cut(ix0.shingles))
    val checked = batches.zipWithIndex.map { case (b, i) =>
      val r = checkAndAppend(ix, b, textCol, idCol, n, numHashes,
        bands, threshold, hashFn)
      ix = r.index
      r.checked.select(col(idCol), lit(i.toLong).as("batch_id"),
        col("is_dup"), col("matched_id"))
    }
    checked.reduce(_.unionByName(_))
  }

  /** The streaming entry: `foreachBatch` routes each arriving
    * micro-batch through [[checkAndAppend]] against the accumulated
    * index and hands the verdict frame (with `batch_id`) to
    * `onBatch`. At-least-once guard: growing the index twice for one
    * batch id is NOT idempotent (the second delivery would self-match
    * against the first), so re-delivered ids are skipped — the
    * [[ContinualDedup]] discipline.
    */
  def start(
      incoming: DataFrame,
      corpus0: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      numHashes: Int = 16,
      bands: Int = 8,
      threshold: Double = 0.8,
      hashFn: Column => Column = TextFunctions.md5Hash60,
      queryName: String = "continual_minhash_dedup")(
      onBatch: DataFrame => Unit): StreamingQuery =
    incoming.writeStream
      .queryName(queryName)
      .foreachBatch(batchStep(corpus0, textCol, idCol, n, numHashes,
        bands, threshold, hashFn)(onBatch))
      .start()

  private[graft] def batchStep(
      corpus0: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double,
      hashFn: Column => Column)(
      onBatch: DataFrame => Unit): (DataFrame, Long) => Unit = {
    var ix: MinhashIndex = null
    var lastMerged = -1L
    (batch, batchId) =>
      if (batchId > lastMerged) {
        if (ix == null) {
          val ix0 = TextDedup.buildMinhashIndex(corpus0, textCol, idCol,
            n, numHashes, bands, hashFn)
          ix = MinhashIndex(Materialize.cut(ix0.bands),
            Materialize.cut(ix0.shingles))
        }
        val r = checkAndAppend(ix, batch, textCol, idCol, n, numHashes,
          bands, threshold, hashFn)
        ix = r.index
        lastMerged = batchId
        onBatch(r.checked.select(lit(batchId).as("batch_id"),
          col(idCol), col("is_dup"), col("matched_id")))
      }
  }
}

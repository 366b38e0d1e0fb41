package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Materialize
import graft.operators.{Multimodal, TextAnalysis}
import graft.operators.TextDedup.MinhashIndex
import graft.pipeline.WarcPipeline
import graft.pipeline.WarcPipeline.WarcPipelineConfig

/** The streaming twin of [[WarcPipeline]] — a composed continual
  * crawl service: batches of fetched WARC.gz archives arrive, and
  * each trigger runs the WHOLE chain —
  *
  *   extraction + quality/language gate
  *   ([[WarcPipeline.extractAndGate]], the SAME code path as the
  *   batch capstone) → near-dup probe against the ACCUMULATED minhash
  *   index ([[ContinualMinhash.checkAndAppend]]: survivors fold in
  *   and become corpus for every later batch) → token counts under
  *   the FROZEN WordPiece vocabulary → sequence packing with RUNNING
  *   global offsets ([[ContinualPacking.step]]'s 1-row state)
  *
  * — emitting one manifest row per gated document: its dedup verdict
  * and, for survivors, its packed placement. The batch capstone
  * proves the chain; production crawls land continuously — this is
  * the service a training run tails while the crawl is still
  * fetching.
  *
  * Scale shape per micro-batch: the archive walk is map-only and only
  * the BATCH is shingled/signed (the corpus index never re-signs);
  * the vocabulary is frozen (no accumulated tokenizer state — the
  * re-train trigger is [[ContinualCoverage]]'s job); packing state is
  * ONE row. Cross-trigger state = the minhash index (bands +
  * shingles, the [[TextDedup.saveMinhashIndex]] parquet shape on a
  * real deployment) + the 1-row pack state, both crossing triggers
  * through [[Materialize.cut]].
  *
  * Contracts inherited from the parts: batch ordering is the dedup
  * semantics ([[ContinualMinhash]] — a doc is a dup iff the initial
  * corpus or a STRICTLY EARLIER batch's survivor matches); media ids
  * must be globally increasing across batches for the packing
  * manifest's `append_ok` to hold ([[ContinualPacking]]); ids must be
  * disjoint from the index's. At-least-once guard: neither the index
  * growth nor the offset advance is idempotent, so re-delivered batch
  * ids are skipped.
  */
object ContinualCrawl {

  /** Cross-trigger state: the accumulated dedup index and the 1-row
    * packing state.
    */
  final case class CrawlState(index: MinhashIndex, pack: DataFrame)

  /** One stepped batch: one manifest row per GATED document —
    * (media_id, is_dup, matched_id, and for survivors the
    * [[TextAnalysis.sequencePackAppend]] placement columns: n_tokens,
    * start_offset, first_seq, last_seq, offset_in_seq,
    * n_seqs_spanned, crosses_boundary, append_ok; null for dups) —
    * plus the state to carry forward.
    */
  final case class SteppedCrawl(manifest: DataFrame, state: CrawlState)

  private val packCols = Seq("n_tokens", "start_offset", "first_seq",
    "last_seq", "offset_in_seq", "n_seqs_spanned", "crosses_boundary",
    "append_ok")

  def step(
      state: CrawlState,
      media: Dataset[Multimodal.MediaRow],
      vocab: DataFrame,
      cfg: WarcPipelineConfig = WarcPipelineConfig()): SteppedCrawl = {
    val (_, gated) = WarcPipeline.extractAndGate(media, cfg)
    val r = ContinualMinhash.checkAndAppend(
      state.index, gated, "text", "media_id", cfg.n, cfg.numHashes,
      cfg.bands, cfg.nearDupThreshold, cfg.hashFn)
    val survivors = gated.join(
      r.checked.filter(!col("is_dup")).select(col("media_id")),
      Seq("media_id"))
    val counts = TextAnalysis.wordpieceTokenCounts(
      survivors, "text", "media_id", vocab)
    val p = ContinualPacking.step(
      state.pack, counts, "media_id", "n_tokens", cfg.targetTokens)
    val manifest = Materialize.cut(
      r.checked.select(col("media_id"), col("is_dup"), col("matched_id"))
        .join(p.manifest.select(col("media_id") +: packCols.map(col): _*),
          Seq("media_id"), "left"))
    SteppedCrawl(manifest, CrawlState(r.index, p.state))
  }

  /** Deterministic batch-mode replay of the stream: fold [[step]]
    * over an ordered batch sequence from the initial corpus index and
    * empty packing state. Output: every gated document as (batch_id,
    * media_id, is_dup, matched_id, pack placement columns). The
    * streaming entry [[start]] produces exactly these rows for the
    * same batch split — pinned by the StreamingSpec MemoryStream
    * equivalence test.
    */
  def replayBatches(
      index0: MinhashIndex,
      vocab: DataFrame,
      batches: Seq[Dataset[Multimodal.MediaRow]],
      cfg: WarcPipelineConfig = WarcPipelineConfig()): DataFrame = {
    require(batches.nonEmpty, "replayBatches: need at least one batch")
    var state = CrawlState(
      MinhashIndex(Materialize.cut(index0.bands),
        Materialize.cut(index0.shingles)),
      ContinualPacking.emptyState(
        batches.head.sparkSession, "media_id"))
    val steps = batches.zipWithIndex.map { case (b, i) =>
      val r = step(state, b, vocab, cfg)
      state = r.state
      r.manifest.select(lit(i.toLong).as("batch_id"), col("*"))
    }
    steps.reduce(_.unionByName(_))
  }

  /** The streaming entry: `foreachBatch` routes each arriving
    * micro-batch of [[Multimodal.MediaRow]]-shaped rows through
    * [[step]] and hands the manifest (with `batch_id`) to `onBatch`.
    * Re-delivered batch ids are skipped (at-least-once guard — index
    * growth and offset advance are both non-idempotent).
    */
  def start(
      incoming: DataFrame,
      index0: MinhashIndex,
      vocab: DataFrame,
      cfg: WarcPipelineConfig = WarcPipelineConfig(),
      queryName: String = "continual_crawl")(
      onBatch: DataFrame => Unit): StreamingQuery =
    incoming.writeStream
      .queryName(queryName)
      .foreachBatch(batchStep(index0, vocab, cfg)(onBatch))
      .start()

  private[graft] def batchStep(
      index0: MinhashIndex,
      vocab: DataFrame,
      cfg: WarcPipelineConfig)(
      onBatch: DataFrame => Unit): (DataFrame, Long) => Unit = {
    var state: CrawlState = null
    var lastMerged = -1L
    (batch, batchId) =>
      if (batchId > lastMerged) {
        if (state == null)
          state = CrawlState(
            MinhashIndex(Materialize.cut(index0.bands),
              Materialize.cut(index0.shingles)),
            ContinualPacking.emptyState(batch.sparkSession, "media_id"))
        import batch.sparkSession.implicits._
        val r = step(state, batch.as[Multimodal.MediaRow], vocab, cfg)
        state = r.state
        lastMerged = batchId
        onBatch(r.manifest.select(lit(batchId).as("batch_id"),
          col("*")))
      }
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.Materialize
import graft.operators.{Chat, Multimodal, TextAnalysis, TextDedup, TextPrep}
import graft.operators.TextDedup.MinhashIndex

/** The crawl-to-trainer capstone: raw WARC.gz bytes in, token-budget
  * training packs out — the Common-Crawl → training-shards product
  * every stage of the library exists for, composed end to end:
  *
  *   WARC.gz member walk → HTTP response bodies (status 200,
  *   text/html) → HTML boilerplate-filtered text extraction →
  *   quality + language gate → near-dup probe against a PERSISTED
  *   minhash index (the already-ingested corpus never re-signs) →
  *   token counts under a PERSISTED WordPiece vocabulary →
  *   token-budget sequence packing
  *
  * Every stage is its own oracle-verified operator (q438 members,
  * q413 extraction, q52 gate, q435 index probe, q428 vocabulary,
  * q437 packing); this object owns only the composition and the
  * per-stage yield audit, the two places where stage chaining bugs
  * (id domains, offset re-basing, schema drift) actually hide.
  *
  * Scale shape: the media walk is map-only (binary state machines in
  * flatMap, metadata + text travel, media bytes don't); both trained
  * artifacts arrive LOADED — the index and the vocabulary are
  * train-once/probe-everywhere parquet, so a 100 TB crawl pass pays
  * only its own signing and segmentation; stage boundaries go
  * through [[Materialize.cut]] so the probe/anti-join and
  * count/pack fan-outs read materialized blocks instead of
  * re-walking the archive bytes.
  */
object WarcPipeline {

  final case class WarcPipelineConfig(
      minQuality: Double = 0.5,
      langs: Set[String] = Set("en"),
      n: Int = 3,
      numHashes: Int = 16,
      bands: Int = 8,
      nearDupThreshold: Double = 0.8,
      // xxhash64: the production fast path (the DocPipeline rule);
      // recall is candidate-only — verification is exact Jaccard
      hashFn: Column => Column = graft.functions.TextFunctions.fastHash,
      targetTokens: Int = 512,
      shards: Int = 8)

  final case class WarcPipelineResult(
      packs: DataFrame,
      kept: DataFrame,
      audit: Seq[(String, Long)])

  /** Stages 1–3 of the chain — WARC.gz member walk → HTTP 200
    * text/html bodies → boilerplate-filtered text extraction →
    * quality + language gate. One source of truth shared by the batch
    * capstone ([[run]]) and the continual crawl service
    * ([[graft.streaming.ContinualCrawl]]), so the two products can
    * never drift apart on extraction semantics.
    *
    * @return (extracted, gated) — both (media_id, text), both cut
    *         (the gate and every downstream consumer read
    *         materialized blocks, never re-walk the archive bytes)
    */
  def extractAndGate(
      media: Dataset[Multimodal.MediaRow],
      cfg: WarcPipelineConfig = WarcPipelineConfig()):
      (DataFrame, DataFrame) = {
    val bodies = Multimodal.warcGzResponseBodies(media).toDF()
      .filter(col("status") === 200 && col("content_type") === "text/html")
    val extracted = Materialize.cut(
      TextPrep.extractText(bodies, "media_id", "body")
        .select(col("media_id"), col("text")))
    val gated = Materialize.cut(
      TextAnalysis.qualityScore(extracted, "text")
        .filter(col("quality_score") >= cfg.minQuality &&
          TextAnalysis.languageId(col("text")).isInCollection(cfg.langs))
        .select(col("media_id"), col("text")))
    (extracted, gated)
  }

  /** @param media      the crawl: one row per fetched WARC.gz archive
    *                   (media_id must be disjoint from the index's ids)
    * @param dedupIndex LOADED persisted minhash index of the
    *                   already-ingested corpus
    *                   ([[TextDedup.loadMinhashIndex]]); probed with
    *                   the SAME (n, numHashes, bands, hashFn) it was
    *                   saved with
    * @param vocab      LOADED persisted WordPiece vocabulary
    *                   ([[graft.operators.TokenizerStore.loadWordpieceVocab]])
    * @param withAudit  when false, skip the per-stage counts (each is
    *                   an action) — the pack-only production path
    */
  def run(
      media: Dataset[Multimodal.MediaRow],
      dedupIndex: MinhashIndex,
      vocab: DataFrame,
      cfg: WarcPipelineConfig = WarcPipelineConfig(),
      withAudit: Boolean = true): WarcPipelineResult = {
    val audit = Seq.newBuilder[(String, Long)]
    if (withAudit) audit += ("media" -> media.count())

    val (extracted, gated) = extractAndGate(media, cfg)
    if (withAudit) audit += ("extracted" -> extracted.count())
    if (withAudit) audit += ("gated" -> gated.count())

    // the incoming batch signs itself; the corpus side is the loaded
    // parquet index — cross-snapshot dedup without re-signing history
    val dups = TextDedup.minhashNearDupPairsAgainstIndex(
      dedupIndex, gated, "text", "media_id", cfg.n, cfg.numHashes,
      cfg.bands, cfg.nearDupThreshold, cfg.hashFn)
      .select(col("id_b").as("media_id")).distinct()
    val survivors = Materialize.cut(
      gated.join(dups, Seq("media_id"), "left_anti"))
    if (withAudit) audit += ("survivors" -> survivors.count())

    val counts = TextAnalysis.wordpieceTokenCounts(
      survivors, "text", "media_id", vocab)
    val convs = survivors.select(col("media_id").as("conv_id"),
      col("text"), length(col("text")).cast("long").as("total_chars"),
      lit("").as("mask_spans"))
    val packs = Materialize.cut(
      Chat.packConversationsByTokens(convs,
        counts.withColumnRenamed("media_id", "conv_id"),
        cfg.targetTokens, cfg.shards)
        .select(col("shard"), col("bin"), col("n_convs"),
          col("packed_tokens"), col("packed_chars"), col("text")))
    if (withAudit) audit += ("packs" -> packs.count())

    WarcPipelineResult(packs, survivors, audit.result())
  }
}

package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Materialize
import graft.operators.{TextAnalysis, TextDedup}

/** End-to-end training-corpus preparation — the LLM-data analogue of
  * [[Processor]]'s fraud pipeline, chaining the document operators
  * into the canonical flow:
  *
  *   PII scrub -> quality filter -> language filter -> exact dedup ->
  *   transitive near-dup clustering (keep cluster minimum) ->
  *   token-window chunking
  *
  * Every stage is the already-tested operator; this object only owns
  * the composition and the per-stage audit (row counts), which any
  * production corpus pipeline must emit to explain its yield.
  */
object DocPipeline {

  final case class DocPipelineConfig(
      minQuality: Double = 0.5,
      langs: Set[String] = Set("en"),
      nearDupThreshold: Double = 0.8,
      chunkSize: Int = 50,
      overlap: Int = 10,
      numHashes: Int = 16,
      bands: Int = 8,
      // xxhash64: the production fast path (single codegen'd pass);
      // md5Hash60 only exists for engine-independent reproducibility
      hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        graft.functions.TextFunctions.fastHash)

  final case class DocPipelineResult(
      chunks: DataFrame,
      keptDocs: DataFrame,
      audit: Seq[(String, Long)])

  def run(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      cfg: DocPipelineConfig = DocPipelineConfig()): DocPipelineResult = {
    val audit = Seq.newBuilder[(String, Long)]
    audit += ("input" -> docs.count())

    // each stage boundary is materialized once (Materialize.cut —
    // localCheckpoint by default, reliable checkpoint() under
    // spark.graft.reliableCheckpoint=true for cluster jobs that must
    // survive executor loss): the audit count AND the next stage both
    // read the materialized result instead of re-executing every
    // upstream stage per action — without this, six audit counts
    // execute the scrub/quality/language lambdas six, five, four...
    // times over the full corpus
    val scrubbed = TextAnalysis.redactPii(docs, textCol)
      .drop(textCol).withColumnRenamed("redacted", textCol)
      .drop("n_emails", "n_urls")

    val quality = Materialize.cut(
      TextAnalysis.qualityScore(scrubbed, textCol)
        .filter(col("quality_score") >= cfg.minQuality)
        .select(col(idCol), col(textCol)))
    audit += ("quality" -> quality.count())

    val lang = Materialize.cut(quality
      .filter(TextAnalysis.languageId(col(textCol)).isInCollection(cfg.langs)))
    audit += ("language" -> lang.count())

    val exact = Materialize.cut(TextDedup.exactDedup(lang, textCol, idCol))
    audit += ("exact_dedup" -> exact.count())

    // transitive near-dup clusters; keep each cluster's minimum id
    val clusters = TextDedup.dedupClusters(
      exact, textCol, idCol, numHashes = cfg.numHashes, bands = cfg.bands,
      threshold = cfg.nearDupThreshold, hashFn = cfg.hashFn)
    val kept = Materialize.cut(exact.join(
      clusters.filter(col(idCol) === col("cluster_id")).select(col(idCol)),
      Seq(idCol)))
    audit += ("near_dedup" -> kept.count())

    val chunks = Materialize.cut(TextAnalysis.chunkTokens(
      kept, textCol, idCol, cfg.chunkSize, cfg.overlap))
    audit += ("chunks" -> chunks.count())

    DocPipelineResult(chunks, kept, audit.result())
  }
}

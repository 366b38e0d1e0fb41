package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Materialize
import graft.operators.{Mixture, TextAnalysis, TextDedup}

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

  /** Second-generation corpus prep, composing the round-6 operators:
    *
    *   quality floor -> repetition filter (Gopher top-token share) ->
    *   quality-aware near-dup selection (keep BEST per cluster, not
    *   first) -> token-budget domain mixture -> per-source report
    *
    * Same discipline as [[run]]: every stage is its own oracle-verified
    * operator, stage boundaries go through [[Materialize.cut]], and the
    * audit explains the yield.
    */
  final case class DocPipelineV2Config(
      minQuality: Double = 0.5,
      maxTopTokenFrac: Double = 0.12,
      nearDupThreshold: Double = 0.8,
      weights: Map[String, Double] = Map.empty,
      seed: Long = 42L,
      numHashes: Int = 16,
      bands: Int = 8,
      hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        graft.functions.TextFunctions.fastHash)

  final case class DocPipelineV2Result(
      corpus: DataFrame,
      report: DataFrame,
      audit: Seq[(String, Long)])

  def runV2(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      domainCol: String,
      cfg: DocPipelineV2Config): DocPipelineV2Result = {
    require(cfg.weights.nonEmpty, "runV2 needs target mixture weights")
    val audit = Seq.newBuilder[(String, Long)]
    audit += ("input" -> docs.count())

    val scored = Materialize.cut(
      TextAnalysis.qualityScore(docs, textCol)
        .filter(col("quality_score") >= cfg.minQuality)
        .select(col(idCol), col(textCol), col(domainCol),
          col("quality_score")))
    audit += ("quality" -> scored.count())

    // the gate only reads top_token_frac, so the unigram-only slice
    // (one gram order) replaces full repetitionStats (three) — the
    // bigram/trigram explode+aggregate passes were computed and thrown
    // away. n_tokens is kept: the mixture stage budgets with it, no
    // second tokenization pass.
    val rep = TextAnalysis.topTokenStats(scored, textCol, idCol)
    val filtered = Materialize.cut(scored.join(
      rep.filter(col("top_token_frac") <= cfg.maxTopTokenFrac)
        .select(col(idCol), col("n_tokens")), Seq(idCol)))
    audit += ("repetition" -> filtered.count())

    val kept = Materialize.cut(TextDedup.dedupKeepBest(
      filtered, textCol, idCol, "quality_score",
      numHashes = cfg.numHashes, bands = cfg.bands,
      threshold = cfg.nearDupThreshold, hashFn = cfg.hashFn))
    audit += ("near_dedup_best" -> kept.count())

    val mixed = Materialize.cut(Mixture.sampleByTokenBudget(
      kept, domainCol, cfg.weights, "n_tokens", idCol, cfg.seed))
    audit += ("mixture" -> mixed.count())

    val report = mixed.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"))
      .orderBy(col(domainCol))
    DocPipelineV2Result(mixed, report, audit.result())
  }

  final case class DocPipelineV3Config(
      minQuality: Double = 0.5,
      spanK: Int = 5,
      nearDupThreshold: Double = 0.8,
      targetSource: String = "src0",
      nSelect: Int = 120,
      numBuckets: Int = 1024,
      seed: Long = 11L,
      numHashes: Int = 16,
      bands: Int = 8,
      hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        graft.functions.TextFunctions.fastHash)

  final case class DocPipelineV3Result(
      corpus: DataFrame,
      report: DataFrame,
      audit: Seq[(String, Long)])

  /** Third-generation corpus prep, composing this round's operators:
    *
    *   Unicode NFC normalize -> duplicated-span scrub (ExactSubstr
    *   remove) -> quality floor on the SCRUBBED text -> quality-aware
    *   near-dedup (keep best per cluster) -> DSIR importance selection
    *   toward a target slice -> per-source report
    *
    * Ordering rationale: normalization precedes every hash (composed/
    * decomposed byte splits would fracture dup groups); the span scrub
    * precedes quality scoring so boilerplate-heavy docs are judged on
    * what would actually be trained on; selection runs last, over
    * deduplicated survivors, so importance weights aren't distorted by
    * duplicate mass. Stage boundaries go through [[Materialize.cut]];
    * the audit explains the yield.
    */
  def runV3(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      domainCol: String,
      cfg: DocPipelineV3Config = DocPipelineV3Config()): DocPipelineV3Result = {
    val spark = docs.sparkSession
    val audit = Seq.newBuilder[(String, Long)]
    audit += ("input" -> docs.count())

    val normalized = docs.withColumn(textCol,
      graft.functions.NfcNormalizeExpr.nfcNormalize(spark, col(textCol)))

    val scrubbed = Materialize.cut(
      TextDedup.removeDupSpans(normalized, textCol, idCol, cfg.spanK)
        .select(col(idCol), col("clean_text").as(textCol))
        .join(normalized.select(col(idCol), col(domainCol)), Seq(idCol)))
    audit += ("scrubbed" -> scrubbed.count())

    val quality = Materialize.cut(
      TextAnalysis.qualityScore(scrubbed, textCol)
        .filter(col("quality_score") >= cfg.minQuality)
        .select(col(idCol), col(textCol), col(domainCol),
          col("quality_score")))
    audit += ("quality" -> quality.count())

    val kept = Materialize.cut(TextDedup.dedupKeepBest(
      quality, textCol, idCol, "quality_score",
      numHashes = cfg.numHashes, bands = cfg.bands,
      threshold = cfg.nearDupThreshold, hashFn = cfg.hashFn))
    audit += ("near_dedup_best" -> kept.count())

    val selected = Materialize.cut(
      Mixture.importanceResample(
        kept, kept.filter(col(domainCol) === cfg.targetSource),
        textCol, idCol, cfg.nSelect, cfg.numBuckets, cfg.seed)
        .join(kept.select(col(idCol), col(textCol), col(domainCol)),
          Seq(idCol)))
    audit += ("selected" -> selected.count())

    val report = selected.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"))
      .orderBy(col(domainCol))
    DocPipelineV3Result(selected, report, audit.result())
  }

  /** Incremental refresh: re-score ONLY what a crawl refresh changed.
    * [[graft.operators.Graphs.snapshotDiff]] classifies ids by
    * fingerprint; `scoreFn` (the expensive per-doc computation —
    * quality, LM scoring, embeddings) runs over added + changed docs
    * only, while unchanged docs carry their previously-materialized
    * scores through a join; removed docs drop out. At 100 TB this is
    * the difference between scoring a few-percent delta and re-running
    * the entire corpus every refresh; the plan never touches unchanged
    * TEXT at all — only (id, score) pairs flow from the old results.
    *
    * @param oldScores previously materialized (idCol, scoreCols...) for
    *                  the old snapshot — trusted as-is
    * @param scoreFn   df with (idCol, textCol) -> df with (idCol,
    *                  scoreCols...); must emit the same score schema as
    *                  `oldScores`
    * @return the new snapshot's scores: (idCol, scoreCols..., status)
    */
  def incrementalScore(
      oldDocs: DataFrame,
      oldScores: DataFrame,
      newDocs: DataFrame,
      idCol: String,
      textCol: String)(scoreFn: DataFrame => DataFrame): DataFrame = {
    val diff = Materialize.cut(graft.operators.Graphs.snapshotDiff(
      oldDocs, newDocs, idCol, textCol))
    val delta = newDocs.join(
      diff.filter(col("status").isin("added", "changed")).select(col(idCol)),
      Seq(idCol))
    val fresh = scoreFn(delta.select(col(idCol), col(textCol)))
      .join(diff.select(col(idCol), col("status")), Seq(idCol))
    val carried = oldScores
      .join(diff.filter(col("status") === "unchanged")
        .select(col(idCol), col("status")), Seq(idCol))
    fresh.unionByName(carried)
  }
}

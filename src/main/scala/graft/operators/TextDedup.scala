package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document deduplication family for training-data pipelines:
  *
  *   - [[exactDedup]]: hash-groupBy on a canonical fingerprint — one
  *     shuffle on a 128-bit key, no text comparison;
  *   - [[minhashNearDupPairs]]: MinHash + LSH banding — shingle ->
  *     signature -> band buckets -> equi-join on (band, band-hash) ->
  *     exact Jaccard verification of candidates only. The join is a hash
  *     equi-join on bucket keys, so shuffle volume is O(candidates), not
  *     O(n²);
  *   - [[simhashNearDupPairs]]: 64-bit SimHash, candidates = exact
  *     signature match on rotated bands (cheap), verified by Hamming
  *     distance;
  *   - embedding-cosine near-dup lives in [[Similarity]].
  *
  * At 100 TB: every stage is a map or an equi-join/groupBy on a hash
  * key; banding keys distribute uniformly by construction, so no skew
  * salting is needed except adversarial inputs (boilerplate shingles) —
  * for those, drop top-frequency shingles before signatures
  * ([[dropBoilerplateShingles]]).
  */
object TextDedup {

  /** Exact dedup: keep the lowest-id row per canonical fingerprint. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    df.withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** Cross-source exact-duplicate matrix: `n_dup(a, b)` = documents of
    * source `b` whose fingerprint ALSO occurs in source `a` (on another
    * document — the diagonal is within-source duplication, docs with a
    * same-source twin). The inter-source overlap audit a corpus curator
    * reads before mixing ("how much of CC is already in Wiki"), and the
    * asymmetry is the point: a tiny source fully contained in a huge one
    * has n_dup(big, small) = |small| but a near-zero reverse share.
    * Zero cells are emitted (a full sources × sources matrix via a
    * cross join of the distinct source lists — domains are few by
    * construction).
    *
    * Scale shape: fingerprints are md5 of normalized text; per-(fp,
    * source) counts are one hash aggregate (corpus shuffles a 32-char
    * hash + source, never text); the doc-level membership join is
    * fp-keyed. Replays exactly in SQL.
    */
  def crossSourceDupMatrix(
      df: DataFrame, textCol: String, idCol: String,
      domainCol: String): DataFrame = {
    val fps = df.select(col(idCol), col(domainCol),
      TextFunctions.fingerprint(col(textCol)).as("__fp"))
    val fpCounts = fps.groupBy(col("__fp"), col(domainCol))
      .agg(count(lit(1)).as("__c"))
    val hits = fps
      .join(fpCounts
          .select(col("__fp"), col(domainCol).as("source_a"), col("__c")),
        Seq("__fp"))
      .filter(col("source_a") =!= col(domainCol) || col("__c") >= 2)
      .groupBy(col("source_a"), col(domainCol).as("source_b"))
      .agg(count(lit(1)).as("n_dup"))
    // tiny (one row per domain) but read twice by the cross join — cut
    // so the corpus-distinct scan runs once
    val sources = graft.Materialize.cut(df.select(col(domainCol)).distinct())
    sources.select(col(domainCol).as("source_a"))
      .crossJoin(sources.select(col(domainCol).as("source_b")))
      .join(hits, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
  }

  /** Shingle-set table: (id, shingles) with optional boilerplate-shingle
    * removal (shingles appearing in more than `maxDocFrac` of docs).
    */
  def shingleSets(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.select(col(idCol), TextFunctions.shingles(col(textCol), n).as("shingles"))

  /** Exploded distinct (id, shingle) table: per-row n-gram array
    * ([[TextFunctions.shingles]] — already per-doc-distinct via
    * `array_distinct`), exploded. Same distinct (id, shingle) set as
    * the pre-round-13 posexplode + `lead`-window + global-distinct
    * shape, with ZERO exchanges behind it: the window form paid a
    * hash-partition + per-doc sort to line tokens up and a second
    * exchange for the distinct, both of which shuffled the whole token
    * stream — at 100 TB exactly the bytes guide §2.3 says must never
    * travel. The in-row builder keeps shingle construction inside the
    * scan stage, so the first shuffle any minhash consumer pays is the
    * id-keyed partial aggregate over (id, shingle) rows.
    */
  def shingleTable(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    require(n >= 1, "shingle size must be >= 1")
    df.select(col(idCol),
      explode(TextFunctions.shingles(col(textCol), n)).as("__s"))
  }

  def dropBoilerplateShingles(
      sets: DataFrame, idCol: String, maxDocFrac: Double): DataFrame = {
    // corpus size stays inside the lazy plan (broadcast 1-row aggregate)
    val nDocs = broadcast(sets.agg(count(lit(1)).cast("double").as("__nd")))
    val hot = sets
      .select(explode(col("shingles")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
      .crossJoin(nDocs)
      .filter(col("df") > lit(maxDocFrac) * col("__nd"))
      .select(collect_list(col("s")).as("hot"))
    sets.crossJoin(broadcast(hot))
      .withColumn("shingles", array_except(col("shingles"), col("hot")))
      .drop("hot")
  }

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * @param bands     number of LSH bands; rows-per-band =
    *                  numHashes / bands. P(candidate | j) =
    *                  1 - (1 - j^r)^b — tune for the target threshold.
    * @param threshold final exact-Jaccard cut applied to candidates.
    */
  /** Shared per-side machinery for the minhash family: the exploded
    * (id, shingle) table plus its banded signatures. Signatures via
    * explode + multi-min aggregate (codegen'd HashAggregate, values
    * identical to TextFunctions.minhashSignature); set size rides in
    * the same single-pass aggregate; band keys carry it so the final
    * Jaccard needs no re-join against a sizes table.
    */
  private def bandedSide(
      df: DataFrame, textCol: String, idCol: String, outId: String,
      n: Int, numHashes: Int, bands: Int,
      hashFn: Column => Column): (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val exploded = shingleTable(df, textCol, idCol, n)
    val minAggs = count(lit(1)).as("__sz") +:
      (0 until numHashes).map(i =>
        min(hashFn(concat(lit(s"$i:"), col("__s")))).as(s"__h$i"))
    val sigs = exploded.groupBy(col(idCol))
      .agg(minAggs.head, minAggs.tail: _*)
    val bandKeys = (0 until bands).map(bi =>
      md5(concat_ws("_",
        (bi * r until (bi + 1) * r).map(i => col(s"__h$i")): _*)))
    val banded = sigs.select(col(idCol).as(outId), col("__sz"),
        posexplode(array(bandKeys: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    (exploded.withColumnRenamed(idCol, outId), banded)
  }

  /** Banded candidate pairs between two banded sides (id_a side, id_b
    * side): equi-join on (band, band key), carrying both set sizes;
    * `ordered = true` keeps only id_a < id_b (self-join dedup).
    */
  private def bandCandidates(
      bandedA: DataFrame, bandedB: DataFrame, ordered: Boolean): DataFrame = {
    val joined = bandedA
      .select(col("id_a"), col("__sz").as("__sza"), col("band"), col("band_key"))
      .join(bandedB.select(col("id_b"), col("__sz").as("__szb"),
          col("band"), col("band_key")),
        Seq("band", "band_key"))
    (if (ordered) joined.filter(col("id_a") < col("id_b")) else joined)
      .select(col("id_a"), col("id_b"), col("__sza"), col("__szb"))
      .distinct()
  }

  /** Exact-Jaccard verification of banded candidate pairs:
    * |A ∩ B| from a (pair, shingle) equi-join,
    * |A ∪ B| = |A| + |B| - |A ∩ B|.
    */
  private def verifyJaccard(
      candidates: DataFrame, exA: DataFrame, exB: DataFrame,
      threshold: Double): DataFrame =
    candidates
      .join(exA, Seq("id_a"))
      .join(exB, Seq("id_b", "__s"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("__inter"),
        first(col("__sza")).as("__sza"), first(col("__szb")).as("__szb"))
      .withColumn("jaccard",
        col("__inter").cast("double") /
          (col("__sza") + col("__szb") - col("__inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** Containment near-dup pairs — |A∩B| / min(|A|, |B|) over n-gram
    * shingle sets: the quote/subset detector. A short document fully
    * quoted inside a long one has Jaccard ≈ |A|/|B| (arbitrarily low —
    * invisible to the minhash family, whose banding is tuned for
    * symmetric similarity) but containment ≈ 1. Pairs come from the
    * shingle inverted index (docs sharing ≥1 surviving shingle), so
    * recall is exact over the pruned shingle space rather than
    * probabilistic.
    *
    * Scale contract: the inverted-index self-join fans out
    * quadratically per shingle posting list, so shingles appearing in
    * more than `maxDf` documents are dropped FIRST (the
    * [[dropBoilerplateShingles]] mitigation, df-bounded instead of
    * frac-bounded) — boilerplate n-grams carry no containment signal
    * and are exactly the lists that explode. Containment is measured
    * over the surviving (informative) shingles, and the denominator
    * uses the pruned set sizes — document that semantic to callers.
    */
  def containmentPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      maxDf: Int = 50,
      threshold: Double = 0.9): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    val ex = shingleTable(df, textCol, idCol, n)
    val dfc = ex.groupBy(col("__s")).agg(count(lit(1)).as("__df"))
    val kept = ex.join(dfc.filter(col("__df") <= maxDf), Seq("__s"))
      .select(col(idCol), col("__s"))
    val sz = kept.groupBy(col(idCol)).agg(count(lit(1)).as("__sz"))
    val inter = kept.select(col(idCol).as("id_a"), col("__s"))
      .join(kept.select(col(idCol).as("id_b"), col("__s")), Seq("__s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("__i"))
    inter
      .join(sz.select(col(idCol).as("id_a"), col("__sz").as("__sza")), Seq("id_a"))
      .join(sz.select(col(idCol).as("id_b"), col("__sz").as("__szb")), Seq("id_b"))
      .withColumn("containment", col("__i").cast("double")
        / least(col("__sza"), col("__szb")).cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  def minhashNearDupPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      numHashes: Int = 16,
      bands: Int = 8,
      threshold: Double = 0.8,
      hashFn: Column => Column = TextFunctions.md5Hash60): DataFrame = {
    // One (id, shingle) exploded table drives everything — shingle
    // arrays never travel through a shuffle or a distinct. At 100 TB
    // this is the difference between shuffling ids+hashes and shuffling
    // whole documents. The downstream consumers (signatures, both sides
    // of the intersection join) share the distinct's shuffle via
    // ReusedExchange — they are one plan, so no persist is needed
    // (explicit persist() measurably destabilizes long sessions: block
    // churn + GC pressure in the driver JVM).
    val (exploded, banded) =
      bandedSide(df, textCol, idCol, idCol, n, numHashes, bands, hashFn)
    val candidates = bandCandidates(
      banded.withColumnRenamed(idCol, "id_a"),
      banded.withColumnRenamed(idCol, "id_b"),
      ordered = true)
    verifyJaccard(candidates,
      exploded.select(col(idCol).as("id_a"), col("__s")),
      exploded.select(col(idCol).as("id_b"), col("__s")),
      threshold)
  }

  /** Incremental near-dedup: candidate pairs between an EXISTING corpus
    * and an INCOMING batch (the production ingestion pattern — new data
    * is checked against what's already stored, never corpus x corpus).
    * Ids must be disjoint across the two inputs. Returns
    * (id_a = corpus id, id_b = incoming id, jaccard >= threshold).
    */
  def minhashNearDupPairsAgainst(
      corpus: DataFrame,
      incoming: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      numHashes: Int = 16,
      bands: Int = 8,
      threshold: Double = 0.8,
      hashFn: Column => Column = TextFunctions.md5Hash60): DataFrame = {
    val (exA, bandedA) =
      bandedSide(corpus, textCol, idCol, "id_a", n, numHashes, bands, hashFn)
    val (exB, bandedB) =
      bandedSide(incoming, textCol, idCol, "id_b", n, numHashes, bands, hashFn)
    val candidates = bandCandidates(bandedA, bandedB, ordered = false)
    verifyJaccard(candidates,
      exA.select(col("id_a"), col("__s")),
      exB.select(col("id_b"), col("__s")),
      threshold)
  }

  /** A persisted minhash-LSH dedup index: the banded signature table
    * (`id`, `size`, `band`, `band_key`) for candidate generation and
    * the exploded shingle table (`id`, `shingle`) for exact-Jaccard
    * verification. See [[saveMinhashIndex]].
    */
  final case class MinhashIndex(bands: DataFrame, shingles: DataFrame)

  /** Persist the corpus side of the minhash-LSH near-dup join — the
    * sign-once / probe-everywhere split for the dedup family,
    * mirroring [[Similarity.saveIndex]] for ANN and
    * [[TokenizerStore]] for tokenizers: the corpus is shingled,
    * min-hashed, and banded ONCE, written as parquet, and every later
    * snapshot probes the LOADED index instead of re-signing the whole
    * corpus (at 100 TB, signing IS the dominant cost of cross-snapshot
    * dedup — the incoming batch is the only thing that should pay it).
    *
    * Two artifacts: `bands` (one row per id x band — the LSH inverted
    * index candidates come from) and `shingles` (the exploded distinct
    * (id, shingle) table the exact-verify join reads). The shingle
    * table is corpus-token-scale — that is the standard trade of a
    * verifying dedup index (the alternative re-reads and re-shingles
    * candidate documents from the corpus store); it partitions freely
    * by id and only CANDIDATE ids' rows are ever joined.
    *
    * The probe side must re-derive signatures with the SAME
    * (n, numHashes, bands, hashFn) — parameters are not persisted
    * (a `hashFn` is code). A numHashes/bands/hashFn mismatch degrades
    * candidate recall but never precision (verification is exact
    * Jaccard either way); the shingle size `n` however MUST match the
    * save-time value — stored shingles are fixed at save-time n, so a
    * probe with a different n would verify Jaccard between
    * different-sized-gram sets and report a number that is neither
    * corpus's metric.
    */
  /** Build the [[MinhashIndex]] frames in memory (the unsaved form of
    * [[saveMinhashIndex]]) — what the continual-stream state carries
    * between micro-batches.
    */
  def buildMinhashIndex(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, numHashes: Int = 16, bands: Int = 8,
      hashFn: Column => Column = TextFunctions.md5Hash60): MinhashIndex = {
    val (exploded, banded) =
      bandedSide(df, textCol, idCol, "id", n, numHashes, bands, hashFn)
    MinhashIndex(
      banded.select(col("id"), col("__sz").as("size"), col("band"),
        col("band_key")),
      exploded.select(col("id"), col("__s").as("shingle")))
  }

  def saveMinhashIndex(
      df: DataFrame, textCol: String, idCol: String, path: String,
      n: Int = 3, numHashes: Int = 16, bands: Int = 8,
      hashFn: Column => Column = TextFunctions.md5Hash60): Unit = {
    val ix = buildMinhashIndex(df, textCol, idCol, n, numHashes, bands,
      hashFn)
    ix.bands.write.mode("overwrite").parquet(path + "/bands")
    ix.shingles.write.mode("overwrite").parquet(path + "/shingles")
  }

  /** Fold an incoming batch INTO a persisted minhash index in place:
    * the batch's band and shingle rows land as NEW parquet files under
    * the same index path (`mode("append")`) — existing data is never
    * rewritten, which is exactly the 100 TB maintenance shape (an
    * index over a growing corpus accretes files per snapshot; a
    * rewrite would re-pay the whole history). Same parameters
    * contract as [[saveMinhashIndex]]; ids must be new to the index.
    * Append-equivalence — save(A) then append(B) loads identically to
    * save(A ∪ B) — is spec-pinned (parquet is unordered row storage;
    * every consumer aggregates or joins, never scans order).
    */
  def appendToMinhashIndex(
      incoming: DataFrame, textCol: String, idCol: String, path: String,
      n: Int = 3, numHashes: Int = 16, bands: Int = 8,
      hashFn: Column => Column = TextFunctions.md5Hash60): Unit = {
    val ix = buildMinhashIndex(incoming, textCol, idCol, n, numHashes,
      bands, hashFn)
    ix.bands.write.mode("append").parquet(path + "/bands")
    ix.shingles.write.mode("append").parquet(path + "/shingles")
  }

  /** Load a persisted minhash-LSH index (see [[saveMinhashIndex]]). */
  def loadMinhashIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String): MinhashIndex =
    MinhashIndex(
      spark.read.parquet(path + "/bands"),
      spark.read.parquet(path + "/shingles"))

  /** [[minhashNearDupPairsAgainst]] with the corpus side LOADED from a
    * persisted index: the incoming batch is signed fresh (same
    * parameters as at save time), candidates come from band-key
    * collisions against the stored inverted index, and the exact
    * Jaccard verify joins the stored shingle rows of candidate ids
    * only. Ids must be disjoint across index and incoming. Returns
    * (id_a = corpus id, id_b = incoming id, jaccard >= threshold) —
    * row-identical to the from-scratch join (parquet round-trips the
    * band keys and shingles bit-exactly; rebuild-equivalence is
    * spec-pinned and harness-pinned).
    */
  def minhashNearDupPairsAgainstIndex(
      index: MinhashIndex,
      incoming: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      numHashes: Int = 16,
      bands: Int = 8,
      threshold: Double = 0.8,
      hashFn: Column => Column = TextFunctions.md5Hash60): DataFrame = {
    val (exB, bandedB) =
      bandedSide(incoming, textCol, idCol, "id_b", n, numHashes, bands,
        hashFn)
    val bandedA = index.bands.select(col("id").as("id_a"),
      col("size").as("__sz"), col("band"), col("band_key"))
    val candidates = bandCandidates(bandedA, bandedB, ordered = false)
    verifyJaccard(candidates,
      index.shingles.select(col("id").as("id_a"),
        col("shingle").as("__s")),
      exB.select(col("id_b"), col("__s")),
      threshold)
  }

  /** Transitive near-dup clusters: pairwise hits chained into
    * connected components (A~B, B~C groups A, B, C together even when
    * A~C never fired), every doc labeled with its component's minimum
    * id. The clustering step real dedup needs — keep one row per
    * cluster_id to dedup with full transitivity.
    */
  def dedupClusters(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, numHashes: Int = 16, bands: Int = 8,
      threshold: Double = 0.8,
      hashFn: Column => Column = TextFunctions.md5Hash60): DataFrame = {
    val pairs = minhashNearDupPairs(df, textCol, idCol, n, numHashes,
      bands, threshold, hashFn).select(col("id_a"), col("id_b"))
    Components.connectedComponents(df.select(col(idCol)), pairs, idCol)
  }

  /** Quality-aware transitive dedup: near-dup clusters via
    * [[dedupClusters]], ONE representative kept per cluster — the
    * highest `scoreCol`, ties broken to the lowest id. Plain
    * lowest-id dedup keeps whichever clone happened to be ingested
    * first; production corpus prep keeps the BEST version (longest /
    * cleanest / highest quality score) of each duplicate group.
    *
    * `df` must already carry `scoreCol` (e.g.
    * [[TextAnalysis.qualityScore]]'s `quality_score`). The selection
    * window partitions by `cluster_id` — component sizes are duplicate
    * groups, bounded and small by construction, so no skew concern.
    * Returns the kept rows with `cluster_id` attached; singletons are
    * their own cluster and always survive.
    */
  def dedupKeepBest(
      df: DataFrame, textCol: String, idCol: String, scoreCol: String,
      n: Int = 3, numHashes: Int = 16, bands: Int = 8,
      threshold: Double = 0.8,
      hashFn: Column => Column = TextFunctions.md5Hash60): DataFrame = {
    val clusters = dedupClusters(df, textCol, idCol, n, numHashes,
      bands, threshold, hashFn)
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.join(clusters, Seq(idCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Benchmark decontamination: per corpus doc, how many of its
    * distinct n-gram shingles appear anywhere in the benchmark set —
    * the overlap audit every training corpus runs against eval
    * benchmarks before release. Plan shape: two exploded (id, shingle)
    * tables equi-joined on the shingle string, distinct (doc, shingle)
    * hits, one count aggregate — ids and shingles through the shuffle,
    * never documents, so the benchmark side (small by construction) is
    * broadcast by AQE and the corpus streams. Returns (idCol, n_shared)
    * for contaminated docs only.
    */
  def contaminationHits(
      corpus: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int = 8): DataFrame = {
    val cs = shingleTable(corpus, textCol, idCol, n)
    val bs = broadcast(
      shingleTable(bench, textCol, idCol, n).select(col("__s")).distinct())
    cs.join(bs, Seq("__s"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** N-gram novelty against a REFERENCE CORPUS: per document, the
    * fraction of its distinct n-grams that appear nowhere in `ref` —
    * high novelty marks genuinely new content worth ingesting; low
    * novelty marks paraphrase/recombination of what the corpus already
    * holds (the incremental-crawl triage signal, and the inverse of a
    * memorization-risk score). The complement of
    * [[contaminationHits]]'s question, at the opposite scale: the
    * reference is corpus-sized, so its shingle set is NOT broadcast —
    * the membership check is a shuffle anti-join on the shingle string,
    * ids and shingles only. Documents with fewer than n tokens have no
    * n-grams and are excluded. Returns (idCol, n_grams, n_unseen,
    * novelty).
    */
  def ngramNovelty(
      df: DataFrame, ref: DataFrame,
      textCol: String, idCol: String, n: Int = 3): DataFrame = {
    val docS = shingleTable(df, textCol, idCol, n)
    val refS = shingleTable(ref, textCol, idCol, n)
      .select(col("__s")).distinct()
    val totals = docS.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
    val unseen = docS.join(refS, Seq("__s"), "left_anti")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_unseen"))
    totals.join(unseen, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        (coalesce(col("n_unseen"), lit(0L)).cast("double") / col("n_grams"))
          .as("novelty"))
  }

  /** Corpus with every contaminated doc removed (any shingle overlap
    * with the benchmark set): the release-gate form of
    * [[contaminationHits]].
    */
  def decontaminate(
      corpus: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int = 8): DataFrame =
    corpus.join(
      contaminationHits(corpus, bench, textCol, idCol, n).select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Benchmark decontamination with a broadcast Bloom-filter pre-prune —
    * the 100 TB form of [[decontaminate]]. [[contaminationHits]] equi-joins
    * EVERY corpus shingle against the bench set; even with the bench side
    * broadcast, all |corpus|·shingles rows flow through the join operator.
    * Here a Bloom filter built over the distinct bench shingles (bench is
    * small by definition — an eval suite, not a corpus) rides the codegen
    * reference array into a map-side `filter`, so only the tiny
    * bloom-positive fraction of corpus shingles reaches the verify join.
    * The verify join against the broadcast exact bench set removes Bloom
    * false positives, so the RESULT IS EXACT for any `fpp` — fpp only
    * trades filter size against prune selectivity.
    *
    * Driver-side state: one `count()` + one `stat.bloomFilter` aggregate
    * over the BENCH side only (both distributed scans; the collected
    * sketch is `numItems·ln(1/fpp)·1.44/8` bytes — ~12 MB for 10M
    * shingles at 1%, exactly what a broadcast would ship anyway). The
    * corpus side stays map-only until the final per-doc aggregate.
    *
    * Returns the surviving corpus rows (no shingle shared with bench).
    */
  def decontaminateBloom(
      corpus: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int = 8,
      fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val bs = shingleTable(bench, textCol, idCol, n).select(col("__s")).distinct()
    val expected = math.max(bs.count(), 1L)
    val bloom = bs.stat.bloomFilter("__s", expected, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    // unique per-call function name: a fixed name in the session-global
    // registry would race under concurrent decontaminateBloom calls —
    // one call's plan could silently bind the OTHER call's filter and
    // prune shingles the verify join never gets to re-check
    val fnName = "graft_bloom_might_contain_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val registry = corpus.sparkSession.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(fnName,
      exprs => graft.functions.BloomMightContainExpr(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(bytes), exprs.head),
      "scala_udf")
    try {
      // eager Dataset analysis substitutes the probe expression into
      // the plan here, so the per-call registry entry can be dropped
      // before returning instead of accumulating forever
      val pruned = shingleTable(corpus, textCol, idCol, n)
        .filter(call_function(fnName, col("__s")))
      val contaminated = pruned.join(broadcast(bs), Seq("__s"))
        .select(col(idCol)).distinct()
      corpus.join(contaminated, Seq(idCol), "left_anti")
    } finally {
      registry.dropFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(fnName))
    }
  }

  /** Near-dedup: drop all but the lowest-id member of each near-dup
    * pair cluster (single-link, one hop — the standard greedy pass).
    */
  def minhashDedup(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, numHashes: Int = 16, bands: Int = 8,
      threshold: Double = 0.8,
      hashFn: Column => Column = TextFunctions.md5Hash60): DataFrame = {
    val losers = minhashNearDupPairs(df, textCol, idCol, n, numHashes, bands,
        threshold, hashFn)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Exploded (id, shingle) table with boilerplate shingles (doc
    * frequency > maxDocFrac of the corpus) removed — the dataflow form
    * of [[dropBoilerplateShingles]]: one groupBy for document
    * frequencies, one broadcast anti-join; shingle ARRAYS never shuffle.
    */
  def keptShingleTable(
      df: DataFrame, textCol: String, idCol: String, n: Int,
      maxDocFrac: Double): DataFrame = {
    val ex = shingleTable(df, textCol, idCol, n)
    val nDocs = broadcast(df.agg(count(lit(1)).cast("double").as("__nd")))
    val hot = ex.groupBy(col("__s")).agg(count(lit(1)).as("__df"))
      .crossJoin(nDocs)
      .filter(col("__df") > lit(maxDocFrac) * col("__nd"))
      .select(col("__s"))
    ex.join(broadcast(hot), Seq("__s"), "left_anti")
  }

  /** SimHash near-dup candidate pairs: equal signature in >=1 of four
    * 16-bit bands -> verify by Hamming distance <= maxHamming.
    */
  /** SimHash signatures via explode + 64 vote-sum aggregates — the
    * codegen'd dataflow form of [[TextFunctions.simhash64]] (identical
    * values; token multiplicity preserved by explode).
    */
  def simhashSignatures(
      df: DataFrame, textCol: String, idCol: String,
      hashFn: Column => Column = TextFunctions.fastHash,
      bits: Int = 64): DataFrame = {
    val exploded = df.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("__t"))
    val h = hashFn(col("__t"))
    val voteAggs = (0 until bits).map(b =>
      sum(when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"__v$b"))
    exploded.groupBy(col(idCol))
      .agg(voteAggs.head, voteAggs.tail: _*)
      .select(col(idCol),
        (0 until bits).map(b =>
          when(col(s"__v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("sig"))
  }

  /** Banded view of a (idCol, sig) signature table: 4 bands of
    * bits/4 signature bits each — a pure projection (banding costs
    * nothing; the expensive part of simhash is SIGNING, which is why
    * the persisted artifact is the signature table alone).
    */
  private def bandedSimhash(
      sigs: DataFrame, idCol: String, outId: String,
      bits: Int): DataFrame = {
    val r = bits / 4
    val bandKeys = (0 until 4).map(bi =>
      shiftright(col("sig"), bi * r).bitwiseAND(lit((1L << r) - 1)))
    sigs.select(col(idCol).as(outId), col("sig"),
      posexplode(array(bandKeys: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
  }

  /** Candidate pairs between two banded simhash sides (>= 1 equal
    * band) verified by Hamming distance; `ordered` keeps id_a < id_b.
    */
  private def simhashVerify(
      bandedA: DataFrame, bandedB: DataFrame, ordered: Boolean,
      maxHamming: Int): DataFrame = {
    val joined = bandedA
      .select(col("id_a"), col("sig").as("sig_a"), col("band"),
        col("band_key"))
      .join(bandedB.select(col("id_b"), col("sig").as("sig_b"),
        col("band"), col("band_key")), Seq("band", "band_key"))
    // the unordered caller is the index probe, whose contract says ids
    // are disjoint across index and incoming; the =!= filter makes a
    // contract violation drop the hamming-0 self-pair instead of
    // silently reporting a document as its own near-duplicate
    (if (ordered) joined.filter(col("id_a") < col("id_b"))
     else joined.filter(col("id_a") =!= col("id_b")))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("hamming",
        TextFunctions.hammingDistance(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** @param hashFn token hash — [[TextFunctions.fastHash]] (xxhash64)
    *               for production, [[TextFunctions.md5Hash60]] with
    *               bits=60 for engine-independent signatures;
    * @param bits   signature width; must be divisible by 4 (bands).
    */
  def simhashNearDupPairs(
      df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3,
      hashFn: Column => Column = TextFunctions.fastHash,
      bits: Int = 64): DataFrame = {
    require(bits % 4 == 0, "bits must divide into 4 bands")
    val sigs = simhashSignatures(df, textCol, idCol, hashFn, bits)
    simhashVerify(
      bandedSimhash(sigs, idCol, "id_a", bits),
      bandedSimhash(sigs, idCol, "id_b", bits),
      ordered = true, maxHamming = maxHamming)
  }

  /** Persist a simhash signature index — the third dedup family's
    * sign-once / probe-everywhere split ([[saveMinhashIndex]] and
    * [[saveWinnowIndex]] are the siblings): one (id, sig) row per
    * document, 8 bytes of signature — the SMALLEST index of the three
    * (simhash carries no verification payload; Hamming distance IS
    * the verdict). Signing is the corpus-scan cost the index
    * amortizes; banding is a free projection re-derived at probe
    * time. Appends accrete parquet files without rewriting history.
    * The probe must use the SAME (hashFn, bits) as at save time —
    * signatures under different token hashes are incomparable.
    */
  def saveSimhashIndex(
      df: DataFrame, textCol: String, idCol: String, path: String,
      hashFn: Column => Column = TextFunctions.fastHash,
      bits: Int = 64): Unit =
    simhashSignatures(df, textCol, idCol, hashFn, bits)
      .select(col(idCol).as("id"), col("sig"))
      .write.mode("overwrite").parquet(path + "/sigs")

  /** Fold an incoming batch's signatures INTO a persisted simhash
    * index in place (`mode("append")` — no rewrite). Same parameters
    * contract as [[saveSimhashIndex]]; ids must be new to the index.
    */
  def appendToSimhashIndex(
      incoming: DataFrame, textCol: String, idCol: String, path: String,
      hashFn: Column => Column = TextFunctions.fastHash,
      bits: Int = 64): Unit =
    simhashSignatures(incoming, textCol, idCol, hashFn, bits)
      .select(col(idCol).as("id"), col("sig"))
      .write.mode("append").parquet(path + "/sigs")

  /** Load a persisted simhash index (see [[saveSimhashIndex]]). */
  def loadSimhashIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path + "/sigs")

  /** Simhash near-dup pairs between a LOADED signature index and an
    * incoming batch: only the batch is signed; the stored corpus
    * contributes its 8-byte signatures, banded in-plan. Ids must be
    * disjoint across index and incoming — a violating id is dropped
    * from the output (id_a =!= id_b guard) rather than reported as
    * its own hamming-0 near-duplicate. Returns (id_a = corpus id,
    * id_b = incoming id, hamming <= maxHamming).
    */
  def simhashNearDupPairsAgainstIndex(
      index: DataFrame, incoming: DataFrame,
      textCol: String, idCol: String,
      maxHamming: Int = 3,
      hashFn: Column => Column = TextFunctions.fastHash,
      bits: Int = 64): DataFrame = {
    require(bits % 4 == 0, "bits must divide into 4 bands")
    val sigsB = simhashSignatures(incoming, textCol, idCol, hashFn, bits)
    simhashVerify(
      bandedSimhash(index, "id", "id_a", bits),
      bandedSimhash(sigsB, idCol, "id_b", bits),
      ordered = false, maxHamming = maxHamming)
  }

  /** Exact repeated-substring coverage — substring-level dedup at
    * k-token granularity (the public ExactSubstr analysis of Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better",
    * re-expressed as dataflow instead of a suffix array): any k-token
    * window occurring >= 2 times in the corpus (across documents or
    * repeated within one) marks its span as duplicated; per document
    * the overlapping marked spans merge (gaps-and-islands: spans all
    * have length k, so consecutive marked positions p, p' belong to one
    * island iff p' - p < k) and the output reports how many tokens sit
    * inside duplicated spans.
    *
    * Scale shape: positions and 60-bit shingle hashes are built
    * in-array per row (one `transform`, no token-array duplication
    * through the explode), the duplicate-shingle set is one hash
    * groupBy, marking is an equi-join on the hash (ids + hashes
    * shuffle, never text), and the interval merge is a per-DOCUMENT
    * window — partitioned by doc id, never by any low-cardinality key.
    *
    * @return (idCol, n_tokens, dup_span_count, dup_tokens,
    *         dup_token_frac) — one row per input document
    */
  def substringDupCoverage(
      df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    val base = df.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__toks"))
    val nSh = size(col("__toks")) - (k - 1)
    val shingleStructs = when(nSh > 0,
      transform(sequence(lit(1), nSh), i =>
        struct(i.as("p"),
          TextFunctions.md5Hash60(
            array_join(slice(col("__toks"), i, lit(k)), " ")).as("sh"))))
      .otherwise(array().cast("array<struct<p:int,sh:bigint>>"))
    val pos = base.select(col(idCol), explode(shingleStructs).as("__s"))
      .select(col(idCol), col("__s.p").as("__p"), col("__s.sh").as("__sh"))
    val dups = pos.groupBy(col("__sh")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2).select(col("__sh"))
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("__p"))
    val islands = pos.join(dups, Seq("__sh"))
      .withColumn("__new",
        when(lag(col("__p"), 1).over(wDoc).isNull ||
          col("__p") - lag(col("__p"), 1).over(wDoc) >= k, 1).otherwise(0))
      .withColumn("__isl", sum(col("__new")).over(
        wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perDoc = islands.groupBy(col(idCol), col("__isl"))
      .agg((max(col("__p")) - min(col("__p")) + k).as("__cov"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("dup_span_count"),
        sum(col("__cov")).cast("long").as("dup_tokens"))
    base.select(col(idCol), size(col("__toks")).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_span_count"), lit(0L)).as("dup_span_count"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast("double")
          / col("n_tokens"), 12).as("dup_token_frac"))
  }

  /** The REMOVE step [[substringDupCoverage]] only reports on: rebuild
    * each document's text with every token that sits inside a
    * corpus-duplicated k-gram span DELETED (the ExactSubstr scrub of
    * Lee et al. 2022, arXiv:2107.06499, as dataflow — C4/RefinedWeb-
    * style span removal rather than whole-doc dropping). A span is any
    * k-gram whose hash occurs >= 2 times across the corpus, the same
    * marking rule as the coverage stats, so report and scrub can never
    * disagree.
    *
    * Scale shape: marking is the same ids+hashes equi-join; the only
    * new stage is the rebuild — a per-DOCUMENT sort of surviving
    * (position, token) pairs via one hash aggregate, bounded by
    * document length, partitioned by doc id (never a low-cardinality
    * key).
    *
    * @return (idCol, n_tokens, n_tokens_kept, n_tokens_dropped,
    *         clean_text); a fully-duplicated document survives with
    *         clean_text = "" rather than disappearing
    */
  /** Sorted-neighborhood near-duplicate pairs (the classic SNM record
    * linkage method — Hernández & Stolfo, SIGMOD '95): sort the corpus
    * by a normalized blocking key (here the lowercased, alphanumeric
    * first `keyLen` chars), slide a window of `windowSize` neighbors
    * over the sorted order, and score only adjacent candidates — edit
    * distance over each document's leading `probeLen` chars, keeping
    * pairs at distance ≤ `maxDistance`. A complement to MinHash: SNM
    * catches short-prefix near-matches (titles, form records) that
    * shingle-Jaccard under-weights, at O(n·w) comparisons.
    *
    * Scale shape: BLOCKED SNM — the slide window partitions by the
    * key's first `blockLen` chars, so the sort-and-slide runs as one
    * hash-partitioned window per block (fully parallel; a truly global
    * window would funnel the corpus through a single task). Pairs
    * whose keys straddle a block boundary are missed — inherent to
    * any blocking method and mitigated the standard way (longer
    * windows, multiple passes with different keys). Candidates emit
    * via `lead`, so there is no self-join and no candidate blow-up;
    * ordering ties break on the id, so pairs are deterministic.
    */
  def sortedNeighborhoodPairs(
      df: DataFrame, textCol: String, idCol: String,
      keyLen: Int = 16, windowSize: Int = 3, probeLen: Int = 64,
      maxDistance: Int = 10, blockLen: Int = 4): DataFrame = {
    require(windowSize >= 1 && keyLen >= 1 && probeLen >= 1)
    require(blockLen >= 1 && blockLen <= keyLen)
    val key = substring(
      regexp_replace(lower(col(textCol)), "[^a-z0-9]", ""), 1, keyLen)
    val probe = substring(col(textCol), 1, probeLen)
    val w = Window.partitionBy(col("__block"))
      .orderBy(col("__key"), col(idCol))
    val base = df.select(col(idCol), key.as("__key"), probe.as("__probe"))
      .withColumn("__block", substring(col("__key"), 1, blockLen))
    val withLeads = (1 to windowSize).foldLeft(base) { (acc, k) =>
      acc
        .withColumn(s"__id$k", lead(col(idCol), k).over(w))
        .withColumn(s"__pr$k", lead(col("__probe"), k).over(w))
    }
    val pairs = (1 to windowSize).map { k =>
      withLeads.select(
        col(idCol).as("id_a"), col(s"__id$k").as("id_b"),
        levenshtein(col("__probe"), col(s"__pr$k")).cast("long")
          .as("edit_distance"))
    }.reduce(_ unionAll _)
    pairs
      .where(col("id_b").isNotNull && col("edit_distance") <= maxDistance)
  }

  def removeDupSpans(
      df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    val base = df.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__toks"))
    val nSh = size(col("__toks")) - (k - 1)
    val shingleStructs = when(nSh > 0,
      transform(sequence(lit(1), nSh), i =>
        struct(i.as("p"),
          TextFunctions.md5Hash60(
            array_join(slice(col("__toks"), i, lit(k)), " ")).as("sh"))))
      .otherwise(array().cast("array<struct<p:int,sh:bigint>>"))
    val pos = base.select(col(idCol), explode(shingleStructs).as("__s"))
      .select(col(idCol), col("__s.p").as("__p"), col("__s.sh").as("__sh"))
    val dups = pos.groupBy(col("__sh")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2).select(col("__sh"))
    val covered = pos.join(dups, Seq("__sh"))
      .select(col(idCol),
        explode(sequence(col("__p"), col("__p") + (k - 1))).as("__p"))
      .distinct()
    val toks = base.select(col(idCol), posexplode(col("__toks")))
      .select(col(idCol), (col("pos") + 1).as("__p"), col("col").as("__t"))
    val rebuilt = toks.join(covered, Seq(idCol, "__p"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__p"), col("__t")))),
          s => s.getField("__t")), " ").as("clean_text"),
        count(lit(1)).as("n_tokens_kept"))
    base.select(col(idCol), size(col("__toks")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"),
        (col("n_tokens") - coalesce(col("n_tokens_kept"), lit(0L)))
          .as("n_tokens_dropped"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** EXACT Jaccard-threshold self-join via prefix filtering (the
    * PPJoin family) — the lossless alternative to the minhash path:
    * order each document's shingles by ascending global document
    * frequency (rarest first, ties by shingle), keep only the first
    * |S| - ceil(t|S|) + 1 as the PREFIX, and join documents that
    * share a prefix shingle. Two sets with Jaccard >= t must overlap
    * in at least ceil(t|S|) elements, so sets sharing NO prefix
    * element cannot reach the threshold — candidate recall is exactly
    * 1 by construction (which is why the oracle can brute-force
    * ground truth instead of replaying the filter). Rarest-first
    * ordering makes prefix posting lists the SHORTEST lists in the
    * corpus — the quadratic per-shingle fan-out lands on the tail of
    * the frequency distribution, the opposite end from the
    * boilerplate hazard that [[dropBoilerplateShingles]] exists for.
    *
    * Shuffle shape: ids + shingle hashes only (documents never move);
    * frequency ranking is one window over the exploded shingle table,
    * verification reuses the exact-intersection join the minhash
    * family uses. Returns (id_a < id_b, jaccard >= threshold).
    */
  def prefixFilterJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0,1], got $threshold")
    val sh = shingleTable(df, textCol, idCol, n)
    val sz = sh.groupBy(col(idCol)).agg(count(lit(1)).as("__sz"))
    val freq = sh.groupBy(col("__s")).agg(count(lit(1)).as("__df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__df"), col("__s"))
    val prefixes = sh
      .join(freq, Seq("__s"))
      .join(sz, Seq(idCol))
      .withColumn("__pos", row_number().over(w))
      .filter(col("__pos") <=
        col("__sz") - ceil(lit(threshold) * col("__sz")) + 1)
    val cand = prefixes
      .select(col(idCol).as("id_a"), col("__sz").as("__sza"), col("__s"))
      .join(prefixes.select(col(idCol).as("id_b"), col("__sz").as("__szb"),
        col("__s")), Seq("__s"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__sza"), col("__szb"))
      .distinct()
    verifyJaccard(cand,
      sh.select(col(idCol).as("id_a"), col("__s")),
      sh.select(col(idCol).as("id_b"), col("__s")),
      threshold)
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003): hash
    * every k-token gram at its position, slide a window of `w`
    * consecutive gram hashes, and keep each window's MINIMUM hash,
    * rightmost position on ties. The distinct (position, hash) pairs
    * selected are the document's fingerprints: any shared token run of
    * length >= w + k - 1 between two documents is GUARANTEED to share
    * at least one selected fingerprint, while only ~2/(w+1) of the
    * gram hashes are kept — exact-recall overlap detection at a
    * fraction of the index size, the deterministic complement to
    * [[minhashNearDupPairs]]'s probabilistic recall.
    *
    * Cross-engine contract: the gram hash is the 48-bit md5 prefix
    * (reproducible in any engine), packed with the position into one
    * long as `h * 16384 + (16383 - pos)` so a plain numeric min gives
    * min-hash-then-rightmost without relying on struct ordering
    * semantics. Positions are therefore bounded at 16383 grams per
    * document, and the gram sequence is CLAMPED at that bound: a
    * longer document is fingerprinted over its first 16383 grams
    * (a position past the bound would borrow into the hash bits and
    * silently corrupt both fields). For full-document coverage of
    * longer inputs, chunk first ([[TextAnalysis.chunkTokens]]) — the
    * clamp keeps the exact-recall guarantee over the covered prefix
    * instead of silently breaking it everywhere.
    *
    * Scale shape: the per-position gram hashes are built in ONE pure
    * Column pass (one md5 per gram — NOT one per window: an array-of-
    * windows formulation would let Catalyst inline the gram array into
    * every window's slice and go quadratic per document), exploded, and
    * the window minima come from a ROWS BETWEEN frame over positions —
    * exactly one hash shuffle on the document id, ~2/(w+1) selected
    * rows per gram onward.
    */
  def winnowFingerprints(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 3,
      w: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    // Round 13: the whole selection runs IN-ROW through the codegen'd
    // [[graft.functions.WinnowExpr]] — same packed-gram hash, window
    // minima and distinct selection as the old explode + id-keyed
    // window + filter + global distinct, with ZERO exchanges behind it
    // (the old shape shuffled every gram to sort it per doc; at 100 TB
    // that is the token stream crossing the network to compute a
    // per-document quantity).
    df.select(col(idCol),
      explode(graft.functions.Native.winnow(
        TextFunctions.tokens(col(textCol)), k, w)).as("__sel"))
      .select(col(idCol), col("__sel.pos").as("pos"), col("__sel.fp").as("fp"))
  }

  /** Overlap candidate pairs from the winnowing fingerprint index:
    * docs sharing at least `minShared` distinct selected fingerprint
    * hashes. Recall is exact for any shared token run of length
    * >= w + k - 1 (the winnowing guarantee), so this is the
    * quote/plagiarism detector that minhash (tuned for whole-document
    * similarity) structurally misses.
    *
    * Scale contract: the inverted-index self-join fans out
    * quadratically per posting list, so fingerprints appearing in more
    * than `maxDf` documents are dropped FIRST — boilerplate runs carry
    * no overlap signal and are exactly the lists that explode (the
    * [[containmentPairs]] mitigation, df-bounded).
    */
  /** C4-style corpus-wide line dedup (Raffel et al. 2020 kept one copy
    * of any repeated span and discarded the rest): the dedup unit is a
    * fixed-width token segment ("line", `lineTokens` wide — this corpus
    * carries no sentence/line markers), the keep rule is the globally
    * FIRST occurrence (lowest (doc_id, line_idx)), and each document is
    * rebuilt from its surviving segments in order. Returns
    * (id, n_lines, n_kept, cleaned) — cleaned is "" when every segment
    * of a document already appeared elsewhere.
    *
    * Scale shape: segments are built in-row (one narrow map), the keep
    * rule is a single row_number over the segment's md5 fingerprint —
    * one shuffle keyed by a 128-bit hash, boilerplate segments
    * collapse into one partition each ONLY as long as their copy count
    * stays window-sized (for adversarial boilerplate, df-prune first,
    * as [[winnowOverlapPairs]] does) — and the rebuild is one hash
    * aggregate per document.
    */
  def lineDedup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      lineTokens: Int = 10): DataFrame = {
    require(lineTokens >= 1, s"lineTokens must be >= 1, got $lineTokens")
    val toks = TextFunctions.tokens(col(textCol))
    val nl = ceil(size(toks).cast("double") / lineTokens).cast("int")
    val lines = df.select(col(idCol),
      posexplode(transform(sequence(lit(1), nl),
        i => array_join(
          slice(toks, (i - 1) * lineTokens + 1, lit(lineTokens)), " "))))
      .select(col(idCol), col("pos").cast("long").as("idx"),
        col("col").as("line"))
    val w = Window.partitionBy(md5(col("line")))
      .orderBy(col(idCol), col("idx"))
    lines.withColumn("__rk", row_number().over(w))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("__rk") === 1, 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("__rk") === 1,
            struct(col("idx"), col("line"))))),
          s => s.getField("line")), " ").as("cleaned"))
  }

  /** Incremental winnowing overlap: arriving documents probed against
    * the FROZEN corpus fingerprint index (the continual-crawl shape —
    * index once, probe every batch; the
    * [[minhashNearDupPairsAgainst]]-style complement to the batch
    * [[winnowOverlapPairs]]). Posting lists are
    * df-pruned on the CORPUS side only, so a batch can never unlock a
    * boilerplate fingerprint the index already dropped. Returns
    * (new_id, corpus_id, shared_fps >= minShared).
    */
  def winnowOverlapAgainst(
      corpus: DataFrame,
      newDocs: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 3,
      w: Int = 4,
      minShared: Int = 3,
      maxDf: Int = 50): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val fpc = winnowFingerprints(corpus, textCol, idCol, k, w)
      .select(col(idCol).as("corpus_id"), col("fp")).distinct()
    val dfc = fpc.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
    val index = fpc.join(dfc.filter(col("__df") <= maxDf), Seq("fp"))
      .select(col("corpus_id"), col("fp"))
    val probe = winnowFingerprints(newDocs, textCol, idCol, k, w)
      .select(col(idCol).as("new_id"), col("fp")).distinct()
    probe.join(index, Seq("fp"))
      .groupBy(col("new_id"), col("corpus_id"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** Persist a winnowing fingerprint index — the sign-once /
    * probe-everywhere split for the EXACT-recall overlap family,
    * completing the persist pattern ([[saveMinhashIndex]] is the
    * probabilistic sibling): the corpus is fingerprinted ONCE
    * ([[winnowFingerprints]]) and its (id, pos, fp) rows land as
    * parquet; later snapshots probe the LOADED index instead of
    * re-fingerprinting the corpus. Longs round-trip parquet
    * bit-exactly, so a loaded index probes row-identically to the
    * from-scratch [[winnowOverlapAgainst]] (spec-pinned).
    *
    * The df-prune (posting lists in > maxDf docs are boilerplate) is
    * applied at PROBE time over the loaded table, not at save time —
    * that is what makes append exact: a fingerprint's document
    * frequency changes as the corpus grows, so freezing the prune
    * into the artifact would either unlock boilerplate (pruned too
    * early) or over-prune (too late). Probe-time pruning gives
    * save(A) + append(B) ≡ save(A ∪ B) exactly.
    *
    * The probe side must re-derive fingerprints with the SAME (k, w)
    * as at save time — parameters are not persisted; k sets the gram
    * the hash is over (a mismatch compares different-sized-gram
    * fingerprints — meaningless, like the minhash shingle-size rule)
    * and w sets which grams were selected.
    */
  def saveWinnowIndex(
      df: DataFrame, textCol: String, idCol: String, path: String,
      k: Int = 3, w: Int = 4): Unit =
    winnowFingerprints(df, textCol, idCol, k, w)
      .select(col(idCol).as("id"), col("pos"), col("fp"))
      .write.mode("overwrite").parquet(path + "/fps")

  /** Fold an incoming batch INTO a persisted winnowing index in
    * place: its fingerprint rows land as NEW parquet files under the
    * same path (`mode("append")`) — existing data is never rewritten,
    * the accrete-per-snapshot maintenance shape. Same parameters
    * contract as [[saveWinnowIndex]]; ids must be new to the index.
    */
  def appendToWinnowIndex(
      incoming: DataFrame, textCol: String, idCol: String, path: String,
      k: Int = 3, w: Int = 4): Unit =
    winnowFingerprints(incoming, textCol, idCol, k, w)
      .select(col(idCol).as("id"), col("pos"), col("fp"))
      .write.mode("append").parquet(path + "/fps")

  /** Load a persisted winnowing index (see [[saveWinnowIndex]]). */
  def loadWinnowIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path + "/fps")

  /** [[winnowOverlapAgainst]] with the corpus side LOADED from a
    * persisted index: arrivals are fingerprinted fresh (same (k, w)
    * as at save time), the corpus side df-prunes the LOADED posting
    * lists (see [[saveWinnowIndex]] for why pruning is probe-time),
    * and docs sharing >= minShared surviving fingerprints pair.
    * Returns (new_id, corpus_id, shared_fps) — row-identical to the
    * from-scratch join.
    */
  def winnowOverlapAgainstIndex(
      index: DataFrame,
      newDocs: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 3,
      w: Int = 4,
      minShared: Int = 3,
      maxDf: Int = 50): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val fpc = index.select(col("id").as("corpus_id"), col("fp")).distinct()
    val dfc = fpc.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
    val pruned = fpc.join(dfc.filter(col("__df") <= maxDf), Seq("fp"))
      .select(col("corpus_id"), col("fp"))
    val probe = winnowFingerprints(newDocs, textCol, idCol, k, w)
      .select(col(idCol).as("new_id"), col("fp")).distinct()
    probe.join(pruned, Seq("fp"))
      .groupBy(col("new_id"), col("corpus_id"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  def winnowOverlapPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 3,
      w: Int = 4,
      minShared: Int = 3,
      maxDf: Int = 50): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDf >= 2, s"maxDf must be >= 2, got $maxDf")
    val fp = winnowFingerprints(df, textCol, idCol, k, w)
      .select(col(idCol), col("fp")).distinct()
    val dfc = fp.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
    val kept = fp.join(dfc.filter(col("__df") <= maxDf), Seq("fp"))
      .select(col(idCol), col("fp"))
    kept.select(col(idCol).as("id_a"), col("fp"))
      .join(kept.select(col(idCol).as("id_b"), col("fp")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** MinHash-LSH parameter planner: for every (bands b, rows-per-band
    * r) factorization of `numHashes` with b and r powers of two, the
    * banding S-curve P(candidate | s) = 1 − (1 − s^r)^b evaluated on a
    * binary grid, with the false-positive mass below the target
    * Jaccard and the false-negative mass above it — the table an
    * operator of a 100 TB dedup reads to pick b and r BEFORE paying
    * for a corpus pass (chernoff-ish: more rows per band sharpens the
    * knee; more bands moves it left).
    *
    * Engine-exactness by construction (no `pow`, no rounding ties):
    * grid points s = i/`grid` with `grid` a power of two are EXACT
    * doubles; s^r and (1−s^r)^b evaluate by repeated squaring —
    * identical multiply sequences round identically in every IEEE
    * engine; per-point masses floor-snap at 12 dp (floor has no
    * half-way ties) and accumulate in decimal. Only the display
    * threshold (1/b)^(1/r) uses libm pow, rounded to 9 dp, and feeds
    * nothing.
    *
    * @param targetJaccard snapped DOWN to the grid: points with
    *                      i ≤ floor(t·grid) count toward FP mass
    * @return per factorization: bands, rows_per_band, threshold,
    *         fp_area, fn_area (grid-midpoint Riemann masses, 9 dp)
    */
  def lshPlan(
      spark: SparkSession, numHashes: Int = 128,
      targetJaccard: Double = 0.5, grid: Int = 128): DataFrame = {
    require(numHashes >= 2 && Integer.bitCount(numHashes) == 1,
      "numHashes must be a power of two >= 2")
    require(grid >= 8 && Integer.bitCount(grid) == 1,
      "grid must be a power of two >= 8")
    require(targetJaccard > 0.0 && targetJaccard < 1.0,
      "targetJaccard in (0,1)")
    val ti = math.floor(targetJaccard * grid).toLong
    def sq(c: Column, n: Int): Column = // n a power of two
      (0 until Integer.numberOfTrailingZeros(n))
        .foldLeft(c)((acc, _) => acc * acc)
    def floor12(c: Column): Column = floor(c * lit(1e12)) / lit(1e12)
    val gridDf = spark.range(1, grid.toLong).toDF("i")
      .withColumn("s", col("i").cast("double") / lit(grid.toDouble))
    val combos = (0 to Integer.numberOfTrailingZeros(numHashes))
      .map(a => (numHashes >> a, 1 << a)) // (bands, rowsPerBand)
    combos.map { case (b, r) =>
      val miss = sq(lit(1.0) - sq(col("s"), r), b) // (1-s^r)^b
      val p = lit(1.0) - miss
      gridDf.agg(
        sum(when(col("i") <= ti, floor12(p)).otherwise(lit(0.0))
          .cast("decimal(38,12)")).as("__fp"),
        sum(when(col("i") > ti, floor12(miss)).otherwise(lit(0.0))
          .cast("decimal(38,12)")).as("__fn"))
        .select(lit(b).as("bands"), lit(r).as("rows_per_band"),
          round(pow(lit(1.0) / b, lit(1.0) / r), 9).as("threshold"),
          (floor(col("__fp").cast("double") / lit(grid.toDouble)
            * lit(1e9)) / lit(1e9)).as("fp_area"),
          (floor(col("__fn").cast("double") / lit(grid.toDouble)
            * lit(1e9)) / lit(1e9)).as("fn_area"))
    }.reduce(_ unionAll _)
  }
}

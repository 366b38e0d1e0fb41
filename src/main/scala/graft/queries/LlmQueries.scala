package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Multimodal, Similarity, TextAnalysis, TextDedup}
import graft.sources.Tables

/** M7: LLM-training-data operators over `documents` / `embeddings` —
  * dedup family, similarity search, text analysis, multimodal plumbing.
  *
  * Oracle strategy: the oracle reproduces the ANSWER, not the algorithm.
  * LSH-based queries are verified against brute-force SQL — both sides
  * are deterministic (seeded hashes, fixed data), so local equality at
  * sf0.01 is frozen-in for the driver run. Heuristic scores without a
  * clean SQL twin (language-ID, simhash with xxhash64) are rows-only
  * here and pinned by unit specs instead.
  */
object LlmQueries {

  /** Text surface statistics (length / token / punctuation profile). */
  val q50TextStats = HarnessQuery(
    "q50_text_stats",
    (spark, dir) =>
      TextAnalysis.textStats(Tables.documents(spark, dir), "text")
        .select(col("doc_id"), col("n_chars"), col("n_tokens"),
          col("mean_token_len"), col("punct_ratio"), col("digit_ratio"),
          col("space_ratio"))
        .orderBy(col("doc_id")),
    Some("""
      WITH t AS (SELECT doc_id, text, length(text) AS n_chars,
                        regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                 FROM documents)
      SELECT doc_id, n_chars, len(toks) AS n_tokens,
             CAST(length(array_to_string(toks, '')) AS DOUBLE) / len(toks) AS mean_token_len,
             CAST(n_chars - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / n_chars AS punct_ratio,
             CAST(n_chars - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / n_chars AS digit_ratio,
             CAST(n_chars - length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / n_chars AS space_ratio
      FROM t ORDER BY doc_id
    """.trim))

  /** BPE-ish token counting (letter runs / digit runs / marks). */
  val q51TokenCount = HarnessQuery(
    "q51_token_count",
    (spark, dir) =>
      Tables.documents(spark, dir)
        .select(col("doc_id"),
          TextAnalysis.bpeishTokenCount(col("text")).as("n_bpeish"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT)
               AS n_bpeish
      FROM documents ORDER BY doc_id
    """.trim))

  /** Language-ID heuristic + quality score — rows-only (heuristic has no
    * SQL twin); invariants pinned in TextAnalysisSpec.
    */
  val q52LangQuality = HarnessQuery(
    "q52_lang_quality",
    (spark, dir) => {
      val scored = TextAnalysis.qualityScore(Tables.documents(spark, dir), "text")
        .withColumn("lang_pred", TextAnalysis.languageId(col("text")))
      scored.groupBy(col("lang_pred"))
        .agg(count(lit(1)).as("n"),
          Parity.dsum(col("quality_score")).as("sum_quality"))
        .orderBy(col("lang_pred"))
    },
    None)

  /** Canonical document fingerprint (md5 of normalized text). */
  val q53Fingerprint = HarnessQuery(
    "q53_fingerprint",
    (spark, dir) =>
      Tables.documents(spark, dir)
        .select(col("doc_id"),
          TextFunctions.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             md5(array_to_string(regexp_split_to_array(trim(lower(text)), '\s+'), ' '))
               AS fingerprint
      FROM documents ORDER BY doc_id
    """.trim))

  /** Word-3-gram shingle sets (the dedup primitive), exploded for a
    * bounded id range.
    */
  val q54Shingles = HarnessQuery(
    "q54_shingles",
    (spark, dir) =>
      Tables.documents(spark, dir)
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
          explode(TextFunctions.shingles(col("text"), 3)).as("shingle"))
        .orderBy(col("doc_id"), col("shingle")),
    Some("""
      WITH t AS (SELECT doc_id,
                        regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                 FROM documents WHERE doc_id < 20)
      SELECT doc_id, shingle FROM (
        SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, len(toks) - 2),
                 i -> array_to_string(toks[i:i+2], ' '))) AS shingle
        FROM t) u
      ORDER BY doc_id, shingle
    """.trim))

  /** MinHash+LSH near-dup pairs (16 hashes, 8 bands, exact-Jaccard
    * verified at 0.8). Oracle = brute-force pairwise Jaccard: banding
    * recall on this corpus is exactly 1 (verified locally, deterministic
    * under the fixed xxhash64 seed).
    */
  val q55MinhashPairs = HarnessQuery(
    "q55_minhash_pairs",
    (spark, dir) =>
      TextDedup.minhashNearDupPairs(
        Tables.documents(spark, dir), "text", "doc_id",
        n = 3, numHashes = 16, bands = 8, threshold = 0.8,
        hashFn = TextFunctions.fastHash)
        .orderBy(col("id_a"), col("id_b")),
    Some("""
      WITH t AS (SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, len(regexp_split_to_array(trim(lower(text)), '\s+')) - 2),
                     i -> array_to_string((regexp_split_to_array(trim(lower(text)), '\s+'))[i:i+2], ' ')))
                     AS sh
                 FROM documents)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
               len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
      FROM t a, t b
      WHERE a.doc_id < b.doc_id
        AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
              len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
      ORDER BY id_a, id_b
    """.trim))

  /** Exact dedup on a corpus with planted clones: originals + the first
    * 50 docs re-inserted under shifted ids; the keep-lowest-id rule must
    * return exactly the original ids.
    */
  val q56ExactDedup = HarnessQuery(
    "q56_exact_dedup",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val clones = docs.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      TextDedup.exactDedup(docs.unionByName(clones), "text", "doc_id")
        .select(col("doc_id")).orderBy(col("doc_id"))
    },
    Some("""
      WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50)
      SELECT min(doc_id) AS doc_id FROM corpus
      GROUP BY md5(array_to_string(regexp_split_to_array(trim(lower(text)), '\s+'), ' '))
      ORDER BY doc_id
    """.trim))

  /** SimHash near-dup pairs (xxhash64 token hashes, Hamming <= 8) —
    * rows-only; semantics pinned in TextDedupSpec.
    */
  val q57SimhashPairs = HarnessQuery(
    "q57_simhash_pairs",
    (spark, dir) =>
      TextDedup.simhashNearDupPairs(
        Tables.documents(spark, dir), "text", "doc_id", maxHamming = 8)
        .orderBy(col("id_a"), col("id_b")),
    None)

  /** SimHash signatures on the md5-based 60-bit hash — fully
    * oracle-checked bit-for-bit (the engine-independent hash makes the
    * whole signature SQL-reproducible; q57 keeps the fast xxhash64 path).
    */
  val q63SimhashSig = HarnessQuery(
    "q63_simhash_sig",
    (spark, dir) =>
      TextDedup.simhashSignatures(
        Tables.documents(spark, dir).filter(col("doc_id") < 100),
        "text", "doc_id",
        hashFn = TextFunctions.md5Hash60, bits = 60)
        .orderBy(col("doc_id")),
    Some("""
      WITH tok AS (SELECT doc_id,
                          unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
                   FROM documents WHERE doc_id < 100),
      h AS (SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS hv
            FROM tok),
      votes AS (SELECT doc_id, b.b,
                       sum(CASE WHEN (hv >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
                FROM h, generate_series(0, 59) b(b) GROUP BY 1, 2)
      SELECT doc_id,
             CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sig
      FROM votes GROUP BY doc_id ORDER BY doc_id
    """.trim))

  /** Brute-force exact cosine top-5 for the first 10 vectors — the ANN
    * correctness baseline, decimal-exact dot products.
    */
  val q58CosineTopK = HarnessQuery(
    "q58_cosine_topk",
    (spark, dir) => {
      val em = Tables.embeddings(spark, dir)
      Similarity.cosineTopK(
        em, em.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .withColumn("cosine", round(col("cosine"), 12))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""
      WITH n AS (
        SELECT vec_id, embedding,
               sqrt(CAST(sum(CAST(CAST(embedding[g.i] AS DOUBLE) * CAST(embedding[g.i] AS DOUBLE)
                 AS DECIMAL(30,18))) AS DOUBLE)) AS nrm
        FROM embeddings, generate_series(1, 64) g(i) GROUP BY 1, 2),
      pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(sum(CAST(CAST(q.embedding[g.i] AS DOUBLE) * CAST(c.embedding[g.i] AS DOUBLE)
                 AS DECIMAL(30,18))) AS DOUBLE) / (any_value(q.nrm) * any_value(c.nrm)) AS cosine
        FROM n q, n c, generate_series(1, 64) g(i)
        WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
        GROUP BY 1, 2),
      ranked AS (
        SELECT query_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS rank
        FROM pairs)
      SELECT query_id, rank, neighbor_id, round(cosine, 12) AS cosine FROM ranked
      WHERE rank <= 5 ORDER BY query_id, rank
    """.trim))

  /** LSH-bucketed ANN over the same queries — the scale path. Fully
    * oracle-checked: the md5-derived hyperplanes and decimal-exact
    * projection signs make the entire candidate set SQL-reproducible,
    * so the oracle replays sketch -> bands -> candidates -> exact
    * re-rank end to end.
    */
  val q59AnnLsh = HarnessQuery(
    "q59_ann_lsh",
    (spark, dir) => {
      val em = Tables.embeddings(spark, dir)
      Similarity.lshCosineTopK(
        em, em.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, numBits = 8, bands = 4)
        .withColumn("cosine", round(col("cosine"), 12))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""
      WITH hp AS (
        SELECT h.h AS h, d.d AS d,
               (CAST(('0x' || substr(md5('42_' || h.h || '_' || d.d), 1, 15)) AS BIGINT)
                 % 1000000) / 1000000.0 - 0.5 AS v
        FROM generate_series(0, 7) h(h), generate_series(0, 63) d(d)),
      dots AS (
        SELECT e.vec_id, hp.h,
               CAST(sum(CAST(CAST(e.embedding[hp.d + 1] AS DOUBLE) * hp.v
                 AS DECIMAL(30,18))) AS DOUBLE) AS dv
        FROM embeddings e, hp GROUP BY 1, 2),
      sk AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN dv > 0 THEN (CAST(1 AS BIGINT) << (7 - h))
                 ELSE 0 END) AS BIGINT) AS sk
        FROM dots GROUP BY 1),
      bands AS (
        SELECT s.vec_id, b.b || '_' || ((s.sk >> (b.b * 2)) & 3) AS band_key
        FROM sk s, generate_series(0, 3) b(b)),
      cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM bands q JOIN bands c USING (band_key)
        WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
      n AS (
        SELECT vec_id, embedding,
               sqrt(CAST(sum(CAST(CAST(embedding[g.i] AS DOUBLE) * CAST(embedding[g.i] AS DOUBLE)
                 AS DECIMAL(30,18))) AS DOUBLE)) AS nrm
        FROM embeddings, generate_series(1, 64) g(i) GROUP BY 1, 2),
      scored AS (
        SELECT cand.query_id, cand.neighbor_id,
               CAST(sum(CAST(CAST(q.embedding[g.i] AS DOUBLE) * CAST(c.embedding[g.i] AS DOUBLE)
                 AS DECIMAL(30,18))) AS DOUBLE) / (any_value(q.nrm) * any_value(c.nrm)) AS cosine
        FROM cand
        JOIN n q ON q.vec_id = cand.query_id
        JOIN n c ON c.vec_id = cand.neighbor_id,
        generate_series(1, 64) g(i)
        GROUP BY 1, 2),
      ranked AS (
        SELECT query_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, rank, neighbor_id, round(cosine, 12) AS cosine
      FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """.trim))

  /** IVF ANN over the same queries (KMeans cells + nprobe routing) —
    * rows-only; recall vs the exact baseline pinned in SimilaritySpec.
    */
  val q62IvfAnn = HarnessQuery(
    "q62_ivf_ann",
    (spark, dir) => {
      val em = Tables.embeddings(spark, dir)
      Similarity.ivfCosineTopK(
        em, em.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nlist = 8, nprobe = 4)
        .orderBy(col("query_id"), col("rank"))
    },
    None)

  /** Embedding near-dup within label blocks (blocking-key pattern):
    * pairs with cosine >= 0.4, exact.
    */
  val q60CosineNearDup = HarnessQuery(
    "q60_cosine_neardup",
    (spark, dir) =>
      Similarity.blockedCosineNearDup(
        Tables.embeddings(spark, dir), "label", "vec_id", "embedding",
        threshold = 0.4)
        .withColumn("cosine", round(col("cosine"), 12))
        .orderBy(col("id_a"), col("id_b")),
    Some("""
      WITH n AS (
        SELECT vec_id, label, embedding,
               sqrt(CAST(sum(CAST(CAST(embedding[g.i] AS DOUBLE) * CAST(embedding[g.i] AS DOUBLE)
                 AS DECIMAL(30,18))) AS DOUBLE)) AS nrm
        FROM embeddings, generate_series(1, 64) g(i) GROUP BY 1, 2, 3)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(CAST(sum(CAST(CAST(a.embedding[g.i] AS DOUBLE) * CAST(b.embedding[g.i] AS DOUBLE)
               AS DECIMAL(30,18))) AS DOUBLE) / (any_value(a.nrm) * any_value(b.nrm)), 12) AS cosine
      FROM n a, n b, generate_series(1, 64) g(i)
      WHERE a.label = b.label AND a.vec_id < b.vec_id
      GROUP BY 1, 2
      HAVING CAST(sum(CAST(CAST(a.embedding[g.i] AS DOUBLE) * CAST(b.embedding[g.i] AS DOUBLE)
               AS DECIMAL(30,18))) AS DOUBLE) / (any_value(a.nrm) * any_value(b.nrm)) >= 0.4
      ORDER BY id_a, id_b
    """.trim))

  /** Multimodal plumbing: binary media column -> partition-batched stub
    * decode -> per-item byte stats. n_bytes and mean_byte are exact
    * (ASCII corpus), decoded via the typed Dataset path.
    */
  val q61Multimodal = HarnessQuery(
    "q61_multimodal",
    (spark, dir) => {
      val media = Multimodal.mediaFromText(
        Tables.documents(spark, dir), "doc_id", "text")
      Multimodal.decodeFeatures(media)
        .select(col("media_id"), col("n_bytes"), col("mean_byte"))
        .orderBy(col("media_id"))
    },
    Some("""
      WITH sums AS (
        SELECT doc_id, sum(ascii(text[i])) AS s
        FROM (SELECT doc_id, text,
                     unnest(generate_series(1, length(text))) AS i
              FROM documents) t
        GROUP BY doc_id)
      SELECT d.doc_id AS media_id,
             octet_length(encode(d.text)) AS n_bytes,
             coalesce(CAST(p.s AS DOUBLE) / nullif(length(d.text), 0), 0.0)
               AS mean_byte
      FROM documents d LEFT JOIN sums p ON d.doc_id = p.doc_id
      ORDER BY media_id
    """.trim))

  /** TF-IDF: top-3 terms per document (doc_id < 20) by weight, exact.
    * Cross-engine parity: tf and idf are double expressions over exact
    * integer counts — identical operands, identical results; weight
    * rounded to 12 to absorb ln() libm tail differences if any.
    */
  val q64Tfidf = HarnessQuery(
    "q64_tfidf",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      // rank on the ROUNDED weight: ln() may differ by 1 ulp across
      // engines, which must not be able to flip rank order
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(round(col("tfidf"), 12).desc, col("term"))
      TextAnalysis.tfidf(Tables.documents(spark, dir), "text", "doc_id")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3 && col("doc_id") < 20)
        .select(col("doc_id"), col("rank").cast("long").as("rank"),
          col("term"), round(col("tfidf"), 12).as("tfidf"))
        .orderBy(col("doc_id"), col("rank"))
    },
    Some("""
      WITH toks AS (SELECT doc_id,
                           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
                    FROM documents),
      tc AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
      dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
      dfreq AS (SELECT term, count(*) AS df FROM tc GROUP BY 1),
      n AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
      scored AS (
        SELECT tc.doc_id, tc.term,
               (CAST(tc.c AS DOUBLE) / dl.dl) * ln(CAST(nd AS DOUBLE) / dfreq.df) AS tfidf
        FROM tc JOIN dl USING (doc_id) JOIN dfreq USING (term), n),
      ranked AS (
        SELECT doc_id, term, tfidf,
               row_number() OVER (PARTITION BY doc_id ORDER BY round(tfidf, 12) DESC, term) AS rank
        FROM scored)
      SELECT doc_id, rank, term, round(tfidf, 12) AS tfidf
      FROM ranked WHERE rank <= 3 AND doc_id < 20
      ORDER BY doc_id, rank
    """.trim))

  def all: Seq[HarnessQuery] = Seq(
    q50TextStats, q51TokenCount, q52LangQuality, q53Fingerprint,
    q54Shingles, q55MinhashPairs, q56ExactDedup, q57SimhashPairs,
    q58CosineTopK, q59AnnLsh, q60CosineNearDup, q61Multimodal, q62IvfAnn,
    q63SimhashSig, q64Tfidf)
}

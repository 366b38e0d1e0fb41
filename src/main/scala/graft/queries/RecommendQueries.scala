package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Mixture, Network, Recommend, TextAnalysis}
import graft.sources.Tables

/** Round-7 additions: network containment joins, neighborhood
  * recommendation, language-model retrieval/scoring, and sampling-table
  * construction — each the Spark-native form of a classic engine
  * operator, oracled cell-exactly in DuckDB.
  */
object RecommendQueries {

  /** CIDR containment join ([[Network.cidrJoin]] + longest-prefix
    * tie-break): events carry derived dotted-quad IPs (the q14
    * construction), nations define 25 deterministic CIDR blocks of
    * width /14../21, and each event reports to its most-specific
    * matching block. The oracle replays lo/hi with the same shift
    * arithmetic and a direct BETWEEN join (fine at oracle scale; the
    * Spark side is the prefix-bucketed equi-join).
    */
  val q295CidrJoin = HarnessQuery(
    "q295_cidr_join",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .withColumn("ip", concat_ws(".",
          pmod(col("user_id"), lit(200L)),
          pmod(col("event_id"), lit(256L)),
          lit(3L), lit(4L)))
        .withColumn("ip_int",
          graft.functions.IpFunctions.ipToInt(col("ip")))
        .select(col("event_id"), col("user_id"), col("ip_int"))
      val blocks = Tables.nation(spark, dir)
        .select(concat(
          pmod(col("n_nationkey") * 8, lit(200)).cast("string"), lit("."),
          pmod(col("n_nationkey") * 13, lit(256)).cast("string"),
          lit(".0.0/"),
          (lit(14) + pmod(col("n_nationkey"), lit(8))).cast("string"))
          .as("cidr"))
      val joined = Network.cidrJoin(ev, "ip_int", blocks, "cidr")
      Network.mostSpecific(joined, Seq("event_id"), "prefix_len",
        col("cidr"))
        .groupBy(col("cidr"), col("prefix_len"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cidr"))
    },
    Some("""
      WITH ev AS (
        SELECT event_id, user_id,
               (user_id % 200) * 16777216 + (event_id % 256) * 65536
                 + 3 * 256 + 4 AS ip_int
        FROM events),
      blk AS (
        SELECT ((n_nationkey * 8) % 200)::VARCHAR || '.' ||
                 ((n_nationkey * 13) % 256)::VARCHAR || '.0.0/' ||
                 (14 + n_nationkey % 8)::VARCHAR AS cidr,
               CAST((n_nationkey * 8) % 200 AS BIGINT) * 16777216 +
                 CAST((n_nationkey * 13) % 256 AS BIGINT) * 65536 AS base,
               14 + n_nationkey % 8 AS p
        FROM nation),
      b2 AS (
        SELECT cidr, p, (base >> (32 - p)) << (32 - p) AS lo FROM blk),
      b3 AS (
        SELECT cidr, p, lo,
               lo + (CAST(1 AS BIGINT) << (32 - p)) - 1 AS hi FROM b2),
      m AS (
        SELECT ev.event_id, ev.user_id, b3.cidr, b3.p
        FROM ev JOIN b3 ON ev.ip_int BETWEEN b3.lo AND b3.hi),
      best AS (
        SELECT * FROM (
          SELECT m.*, row_number() OVER
            (PARTITION BY event_id ORDER BY p DESC, cidr) AS rk
          FROM m) WHERE rk = 1)
      SELECT cidr, CAST(p AS INT) AS prefix_len,
             count(*) AS n_events,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM best GROUP BY 1, 2 ORDER BY cidr
    """.trim))

  /** Interpolated Kneser-Ney bigram scoring
    * ([[TextAnalysis.knBigramLogProb]], d = 0.75) of every document
    * against the src0/src1 reference — the discounting upgrade of
    * q275's stupid backoff, with the continuation-probability
    * lower-order model unrolled in the oracle.
    */
  val q296KneserNey = HarnessQuery(
    "q296_kneser_ney",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      // floor-snap, not round: the raw double is bit-identical in both
      // engines (exact decimal sum, one double division), and floor has
      // no half-way tie for the engines' round() to disagree on
      // (ARCHITECTURE "round() is engine-divergent at half boundaries";
      // q296 hit a dead-center ...275e-10 on doc 483 under round)
      TextAnalysis.knBigramLogProb(
        docs, docs.filter(col("source").isin("src0", "src1")),
        "text", "doc_id")
        .withColumn("kn_logprob", floor(col("kn_logprob") * 1e10) / 1e10)
        .select(col("doc_id"), col("n_bigrams"), col("kn_logprob"),
          (floor(exp(-col("kn_logprob")) * 1e8) / 1e8).as("perplexity"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH ref AS (
        SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS a
        FROM documents WHERE source IN ('src0', 'src1')),
      refbg AS (
        SELECT w1, w2, count(*) AS bc FROM (
          SELECT unnest(a[1:len(a)-1]) AS w1, unnest(a[2:len(a)]) AS w2
          FROM ref WHERE len(a) >= 2) GROUP BY 1, 2),
      hist AS (
        SELECT w1, CAST(sum(bc) AS BIGINT) AS c1, count(*) AS n1fw
        FROM refbg GROUP BY 1),
      cont AS (SELECT w2, count(*) AS n1bw FROM refbg GROUP BY 1),
      types AS (SELECT CAST(count(*) AS DOUBLE) AS btypes FROM refbg),
      docs AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
        FROM documents),
      dbg AS (
        SELECT doc_id, w1, w2, count(*) AS n FROM (
          SELECT doc_id, unnest(a[1:len(a)-1]) AS w1,
                 unnest(a[2:len(a)]) AS w2
          FROM docs WHERE len(a) >= 2) GROUP BY 1, 2, 3),
      scored AS (
        SELECT dbg.doc_id, dbg.n,
          CASE WHEN h.c1 IS NOT NULL THEN
            greatest(COALESCE(CAST(b.bc AS DOUBLE), 0.0) - 0.75, 0.0) / h.c1
              + 0.75 * h.n1fw / h.c1 *
                COALESCE(CAST(c.n1bw AS DOUBLE) / t.btypes,
                         1.0 / (t.btypes + 1))
          ELSE COALESCE(CAST(c.n1bw AS DOUBLE) / t.btypes,
                        1.0 / (t.btypes + 1)) END AS p
        FROM dbg
        LEFT JOIN refbg b ON b.w1 = dbg.w1 AND b.w2 = dbg.w2
        LEFT JOIN hist h ON h.w1 = dbg.w1
        LEFT JOIN cont c ON c.w2 = dbg.w2, types t),
      base AS (
        SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
               floor(CAST(sum(CAST(n * ln(p) AS DECIMAL(30,12))) AS DOUBLE)
                     / sum(n) * 1e10) / 1e10 AS kn_logprob
        FROM scored GROUP BY doc_id)
      SELECT doc_id, n_bigrams, kn_logprob,
             floor(exp(-kn_logprob) * 1e8) / 1e8 AS perplexity
      FROM base ORDER BY doc_id
    """.trim))

  /** Item-item collaborative filtering
    * ([[Recommend.itemItemCosine]] -> [[Recommend.itemTopK]]): baskets
    * are customer x coarsened part (l_partkey % 200) from
    * orders |><| lineitem; top-3 neighbors for the first 20 items.
    */
  val q297ItemCf = HarnessQuery(
    "q297_item_cf",
    (spark, dir) => {
      val baskets = Tables.orders(spark, dir)
        .join(Tables.lineitem(spark, dir),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("user"),
          pmod(col("l_partkey"), lit(200L)).as("item"))
      val pairs = Recommend.itemItemCosine(
        baskets, "user", "item", maxBasket = 100, minCo = 3L)
      Recommend.itemTopK(pairs, 3)
        .filter(col("item") < 20)
        .select(col("item"), col("rank"), col("neighbor"), col("co"),
          round(col("cosine"), 10).as("cosine"))
        .orderBy(col("item"), col("rank"))
    },
    Some("""
      WITH baskets AS (
        SELECT DISTINCT o.o_custkey AS u, l.l_partkey % 200 AS i
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      kept AS (
        SELECT u, i FROM (
          SELECT u, i, count(*) OVER (PARTITION BY u) AS bs
          FROM baskets) WHERE bs <= 100),
      deg AS (SELECT i, count(*) AS n FROM kept GROUP BY 1),
      co AS (
        SELECT a.i AS item_a, b.i AS item_b, count(*) AS co
        FROM kept a JOIN kept b ON a.u = b.u AND a.i < b.i
        GROUP BY 1, 2 HAVING count(*) >= 3),
      sim AS (
        SELECT co.item_a, co.item_b, co.co, da.n AS n_a, db.n AS n_b,
               round(CAST(co.co AS DOUBLE) /
                 sqrt(CAST(da.n AS DOUBLE) * CAST(db.n AS DOUBLE)), 10)
                 AS cosine
        FROM co JOIN deg da ON da.i = co.item_a
                JOIN deg db ON db.i = co.item_b),
      directed AS (
        SELECT item_a AS item, item_b AS neighbor, cosine, co FROM sim
        UNION ALL
        SELECT item_b, item_a, cosine, co FROM sim),
      ranked AS (
        SELECT item, neighbor, cosine, co, row_number() OVER
          (PARTITION BY item ORDER BY cosine DESC, neighbor) AS rank
        FROM directed)
      SELECT item, CAST(rank AS INT) AS rank, neighbor,
             CAST(co AS BIGINT) AS co, cosine
      FROM ranked WHERE rank <= 3 AND item < 20
      ORDER BY item, rank
    """.trim))

  /** Dirichlet-smoothed query likelihood
    * ([[TextAnalysis.queryLikelihood]], mu = 500) for the query
    * {hash, join, scan, vector} — the LM-IR baseline beside q67's
    * BM25, decomposed so only matched postings join (background mass
    * is a closed form).
    */
  val q298QueryLikelihood = HarnessQuery(
    "q298_query_likelihood",
    (spark, dir) =>
      TextAnalysis.queryLikelihood(
        Tables.documents(spark, dir), "text", "doc_id",
        Seq("hash", "join", "scan", "vector"), mu = 500.0, k = 20)
        .select(col("doc_id"), col("n_matched"), col("ql_score"))
        .orderBy(col("ql_score").desc, col("doc_id")),
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)),
          '\s+')) AS term
        FROM documents),
      dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
      cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY 1),
      ctot AS (SELECT CAST(count(*) AS DOUBLE) AS ctot FROM toks),
      qm AS (
        SELECT cf.term, 500.0 * cf.cf / ctot.ctot AS bg
        FROM cf, ctot
        WHERE cf.term IN ('hash', 'join', 'scan', 'vector')),
      qbg AS (
        SELECT CAST(sum(CAST(ln(bg) AS DECIMAL(30,12))) AS DOUBLE)
                 AS bgsum,
               CAST(count(*) AS DOUBLE) AS nq
        FROM qm),
      tf AS (
        SELECT t.doc_id, t.term, qm.bg, count(*) AS tf
        FROM toks t JOIN qm ON qm.term = t.term
        GROUP BY 1, 2, 3),
      lifted AS (
        SELECT doc_id,
               CAST(sum(CAST(ln(tf + bg) - ln(bg) AS DECIMAL(30,12)))
                 AS DOUBLE) AS lsum,
               count(*) AS n_matched
        FROM tf GROUP BY 1),
      scored AS (
        SELECT l.doc_id, l.n_matched,
               round(l.lsum + q.bgsum - q.nq * ln(d.dl + 500.0), 10)
                 AS ql_score
        FROM lifted l JOIN dl d ON d.doc_id = l.doc_id, qbg q)
      SELECT doc_id, n_matched, ql_score FROM scored
      ORDER BY ql_score DESC, doc_id LIMIT 20
    """.trim))

  /** word2vec negative-sampling table + draw audit
    * ([[Mixture.negativeSamplingTable]] count^0.75 via IEEE-exact
    * sqrt(x*sqrt(x)), [[Mixture.negativeSamplingAudit]] with 5000
    * md5-derived uniforms): expected vs actual draws per vocab token.
    */
  val q299NegSampling = HarnessQuery(
    "q299_neg_sampling",
    (spark, dir) => {
      val table = Mixture.negativeSamplingTable(
        Tables.documents(spark, dir), "text", vocabSize = 100)
      Mixture.negativeSamplingAudit(table, nDraws = 5000, seed = 42L)
        .select(col("token"), col("uc"),
          round(col("weight"), 12).as("weight"),
          round(col("expected"), 8).as("expected"), col("actual"))
        .orderBy(col("uc").desc, col("token"))
    },
    Some("""
      WITH counts AS (
        SELECT t.term AS token, count(*) AS uc FROM (
          SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
            AS term
          FROM documents) t GROUP BY 1),
      top AS (
        SELECT token, uc FROM (
          SELECT token, uc, row_number() OVER
            (ORDER BY uc DESC, token) AS rk
          FROM counts) WHERE rk <= 100),
      wt AS (
        SELECT token, uc,
               sqrt(CAST(uc AS DOUBLE) * sqrt(CAST(uc AS DOUBLE))) AS w
        FROM top),
      tot AS (
        SELECT CAST(sum(CAST(w AS DECIMAL(30,12))) AS DOUBLE) AS tot
        FROM wt),
      cum AS (
        SELECT token, uc, w,
               CAST(sum(CAST(w AS DECIMAL(30,12))) OVER
                 (ORDER BY uc DESC, token
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DECIMAL(30,12)) AS c
        FROM wt),
      intervals AS (
        SELECT token, uc, w / t.tot AS weight,
               CAST(c - CAST(w AS DECIMAL(30,12)) AS DOUBLE) / t.tot
                 AS cum_lo,
               CAST(c AS DOUBLE) / t.tot AS cum_hi
        FROM cum, tot t),
      draws AS (
        SELECT (CAST(('0x' || substr(md5('42_' || i), 1, 15)) AS BIGINT))
                 / 1152921504606846976.0 AS u
        FROM generate_series(1, 5000) g(i)),
      hits AS (
        SELECT iv.token, count(*) AS actual
        FROM draws d JOIN intervals iv
          ON d.u >= iv.cum_lo AND d.u < iv.cum_hi
        GROUP BY 1)
      SELECT iv.token, CAST(iv.uc AS BIGINT) AS uc,
             round(iv.weight, 12) AS weight,
             round(5000.0 * iv.weight, 8) AS expected,
             COALESCE(h.actual, 0) AS actual
      FROM intervals iv LEFT JOIN hits h ON h.token = iv.token
      ORDER BY iv.uc DESC, iv.token
    """.trim))

  def all: Seq[HarnessQuery] = Seq(
    q295CidrJoin, q296KneserNey, q297ItemCf, q298QueryLikelihood,
    q299NegSampling)
}

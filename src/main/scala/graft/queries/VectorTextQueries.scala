package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Clustering, Collocations, LinAlg, Similarity, TimeSeries, Valuation}
import graft.sources.Tables

/** Round-7 additions: corpus collocation statistics (PMI bigrams,
  * token entropy), distributed dense linear algebra over the embedding
  * table (Gram / covariance matrix — the pre-PCA statistics), and the
  * walk-forward time split.
  */
object VectorTextQueries {

  /** Corpus-wide adjacent-pair PMI ([[Collocations.adjacentPairsPmi]]):
    * in-row bigram generation, vocabulary-keyed joins, integer-exact
    * operands into one logged double.
    */
  val q211CollocPmi = HarnessQuery(
    "q211_colloc_pmi",
    (spark, dir) =>
      Collocations.adjacentPairsPmi(Tables.documents(spark, dir), "text", 30L)
        .orderBy(col("w1"), col("w2")),
    Some("""
      WITH t AS (
        SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        FROM documents),
      bi AS (
        SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                 k -> struct_pack(w1 := toks[k], w2 := toks[k + 1]))) AS b
        FROM t WHERE len(toks) >= 2),
      pairs AS (
        SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS n_pair
        FROM bi GROUP BY 1, 2 HAVING count(*) >= 30),
      uni AS (
        SELECT w, count(*) AS n_w
        FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
      tot AS (SELECT CAST(sum(n_w) AS BIGINT) AS n_tokens FROM uni)
      SELECT p.w1, p.w2, p.n_pair, u1.n_w AS n_w1, u2.n_w AS n_w2,
             round(ln(CAST(p.n_pair AS DOUBLE) * (SELECT n_tokens FROM tot)
                   / (CAST(u1.n_w AS DOUBLE) * u2.n_w)), 12) AS pmi
      FROM pairs p
      JOIN uni u1 ON p.w1 = u1.w
      JOIN uni u2 ON p.w2 = u2.w
      ORDER BY w1, w2
    """.trim))

  /** Per-document token entropy ([[Collocations.tokenEntropy]]):
    * exact-decimal term sums, one double division for the normalized
    * form.
    */
  val q212TokenEntropy = HarnessQuery(
    "q212_token_entropy",
    (spark, dir) =>
      Collocations.tokenEntropy(Tables.documents(spark, dir), "doc_id", "text")
        .orderBy(col("doc_id")),
    Some("""
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        FROM documents),
      c AS (
        SELECT doc_id, w, count(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY 1, 2),
      tot AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, count(*) AS n_distinct
        FROM c GROUP BY 1),
      terms AS (
        SELECT c.doc_id, tot.n, tot.n_distinct,
               CAST((CAST(c.c AS DOUBLE) / tot.n)
                 * ln(CAST(c.c AS DOUBLE) / tot.n) AS DECIMAL(30,18)) AS term
        FROM c JOIN tot USING (doc_id))
      SELECT doc_id, n AS n_tokens, n_distinct,
             round(CAST(-sum(term) AS DOUBLE), 12) AS entropy,
             round(CAST(-sum(term) AS DOUBLE)
               / nullif(ln(CAST(n_distinct AS DOUBLE)), 0), 12) AS norm_entropy
      FROM terms GROUP BY doc_id, n, n_distinct ORDER BY doc_id
    """.trim))

  /** Gram matrix upper triangle over the embedding table
    * ([[LinAlg.gramMatrix]]): the O(n d^2) product stream stays inside
    * the map-side partial aggregate; only d(d+1)/2 sums shuffle.
    */
  val q213GramMatrix = HarnessQuery(
    "q213_gram_matrix",
    (spark, dir) =>
      LinAlg.gramMatrix(Tables.embeddings(spark, dir), "embedding", 64)
        .withColumn("dot", round(col("dot"), 12))
        .orderBy(col("i"), col("j")),
    Some("""
      WITH pr AS (
        SELECT g1.i AS i, g2.j AS j,
               CAST(CAST(embedding[g1.i + 1] AS DOUBLE)
                 * CAST(embedding[g2.j + 1] AS DOUBLE) AS DECIMAL(30,18)) AS p
        FROM embeddings,
             generate_series(0, 63) g1(i), generate_series(0, 63) g2(j)
        WHERE g1.i <= g2.j)
      SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
             round(CAST(sum(p) AS DOUBLE), 12) AS dot
      FROM pr GROUP BY i, j ORDER BY i, j
    """.trim))

  /** Covariance matrix upper triangle ([[LinAlg.covarianceMatrix]]):
    * cov = sxy/n - (sx/n)(sy/n) from exact decimal sums, double
    * arithmetic in one fixed expression order.
    */
  val q214CovMatrix = HarnessQuery(
    "q214_cov_matrix",
    (spark, dir) =>
      LinAlg.covarianceMatrix(Tables.embeddings(spark, dir), "embedding", 64)
        .orderBy(col("i"), col("j")),
    Some("""
      WITH pr AS (
        SELECT g1.i AS i, g2.j AS j,
               CAST(CAST(embedding[g1.i + 1] AS DOUBLE)
                 * CAST(embedding[g2.j + 1] AS DOUBLE) AS DECIMAL(30,18)) AS p
        FROM embeddings,
             generate_series(0, 63) g1(i), generate_series(0, 63) g2(j)
        WHERE g1.i <= g2.j),
      gram AS (SELECT i, j, CAST(sum(p) AS DOUBLE) AS dot FROM pr GROUP BY 1, 2),
      s AS (
        SELECT g.i AS i,
               sum(CAST(CAST(embedding[g.i + 1] AS DOUBLE) AS DECIMAL(30,18))) AS sx,
               count(*) AS n
        FROM embeddings, generate_series(0, 63) g(i) GROUP BY 1)
      SELECT CAST(gram.i AS INT) AS i, CAST(gram.j AS INT) AS j,
             round(gram.dot / si.n
               - (CAST(si.sx AS DOUBLE) / si.n)
                 * (CAST(sj.sx AS DOUBLE) / sj.n), 12) AS cov
      FROM gram JOIN s si ON gram.i = si.i JOIN s sj ON gram.j = sj.i
      ORDER BY i, j
    """.trim))

  /** Walk-forward folds over events ([[TimeSeries.walkForwardFolds]]):
    * expanding-window time splits — day-level pre-aggregation, the
    * only window is over the tiny distinct-day set.
    */
  val q215WalkForward = HarnessQuery(
    "q215_walk_forward",
    (spark, dir) =>
      TimeSeries.walkForwardFolds(Tables.events(spark, dir), "ts", 5)
        .orderBy(col("fold")),
    Some("""
      WITH e AS (
        SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        FROM events),
      d AS (SELECT day, count(*) AS n FROM e GROUP BY 1),
      b AS (SELECT day, n, ntile(5) OVER (ORDER BY day) AS fold FROM d),
      f AS (
        SELECT fold, min(day) AS test_day_min, max(day) AS test_day_max,
               CAST(sum(n) AS BIGINT) AS test_rows
        FROM b GROUP BY 1)
      SELECT CAST(fold AS INT) AS fold, test_day_min, test_day_max, test_rows,
             CAST(COALESCE(sum(test_rows) OVER
               (ORDER BY fold ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) AS BIGINT) AS train_rows
      FROM f ORDER BY fold
    """.trim))

  /** Semi-supervised label propagation over the LSH kNN graph
    * ([[graft.operators.Graphs.labelPropagation]], 2 synchronous
    * rounds, clamped seeds = the 20% of vectors with vec_id % 5 == 0):
    * the oracle replays the q132 edge construction, then unrolls both
    * vote->rank->adopt rounds.
    */
  val q216LabelProp = HarnessQuery(
    "q216_label_prop",
    (spark, dir) => {
      val em = Tables.embeddings(spark, dir)
      val verts = em.select(col("vec_id"),
        when(pmod(col("vec_id"), lit(5L)) === 0, col("label")).as("seed"))
      val edges = graft.operators.Similarity.lshKnnGraph(
        em, "vec_id", "embedding", k = 3, numBits = 24, bands = 3)
        .select(col("id_a"), col("id_b"))
      graft.operators.Graphs.labelPropagation(
        verts, "vec_id", "seed", edges, "id_a", "id_b", rounds = 2)
        .orderBy(col("vec_id"))
    },
    Some("""
      WITH hp AS (
        SELECT h.h AS h, d.d AS d,
               (CAST(('0x' || substr(md5('42_' || h.h || '_' || d.d), 1, 15)) AS BIGINT)
                 % 1000000) / 1000000.0 - 0.5 AS v
        FROM generate_series(0, 23) h(h), generate_series(0, 63) d(d)),
      dots AS (
        SELECT e.vec_id, hp.h,
               CAST(sum(CAST(CAST(e.embedding[hp.d + 1] AS DOUBLE) * hp.v
                 AS DECIMAL(30,18))) AS DOUBLE) AS dv
        FROM embeddings e, hp GROUP BY 1, 2),
      sk AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN dv > 0 THEN (CAST(1 AS BIGINT) << (23 - h))
                 ELSE 0 END) AS BIGINT) AS sk
        FROM dots GROUP BY 1),
      bands AS (
        SELECT s.vec_id, b.b || '_' || ((s.sk >> (b.b * 8)) & 255) AS band_key
        FROM sk s, generate_series(0, 2) b(b)),
      cand AS (
        SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
        FROM bands a JOIN bands c USING (band_key)
        WHERE a.vec_id <> c.vec_id),
      n AS (
        SELECT vec_id, embedding,
               sqrt(CAST(sum(CAST(CAST(embedding[g.i] AS DOUBLE) * CAST(embedding[g.i] AS DOUBLE)
                 AS DECIMAL(30,18))) AS DOUBLE)) AS nrm
        FROM embeddings, generate_series(1, 64) g(i) GROUP BY 1, 2),
      scored AS (
        SELECT cand.id_a, cand.id_b,
               CAST(sum(CAST(CAST(a.embedding[g.i] AS DOUBLE) * CAST(b.embedding[g.i] AS DOUBLE)
                 AS DECIMAL(30,18))) AS DOUBLE) / (any_value(a.nrm) * any_value(b.nrm)) AS cosine
        FROM cand
        JOIN n a ON a.vec_id = cand.id_a
        JOIN n b ON b.vec_id = cand.id_b,
        generate_series(1, 64) g(i)
        GROUP BY 1, 2),
      ranked AS (
        SELECT id_a, id_b, cosine,
               row_number() OVER (PARTITION BY id_a
                 ORDER BY cosine DESC, id_b) AS rank
        FROM scored),
      e AS (SELECT id_a AS src, id_b AS dst FROM ranked WHERE rank <= 3),
      und AS (
        SELECT DISTINCT u, v FROM (
          SELECT src AS u, dst AS v FROM e
          UNION ALL SELECT dst, src FROM e)),
      l0 AS (
        SELECT vec_id AS id,
               CASE WHEN vec_id % 5 = 0 THEN label END AS seed,
               CASE WHEN vec_id % 5 = 0 THEN label END AS lbl
        FROM embeddings),
      vote1 AS (
        SELECT und.u, l.lbl AS nl, count(*) AS c
        FROM und JOIN l0 l ON und.v = l.id
        WHERE l.lbl IS NOT NULL GROUP BY 1, 2),
      win1 AS (
        SELECT u AS id, nl AS win FROM (
          SELECT u, nl, row_number() OVER
            (PARTITION BY u ORDER BY c DESC, nl) AS rk
          FROM vote1) WHERE rk = 1),
      l1 AS (
        SELECT l0.id, l0.seed,
               COALESCE(l0.seed, w.win, l0.lbl) AS lbl
        FROM l0 LEFT JOIN win1 w ON l0.id = w.id),
      vote2 AS (
        SELECT und.u, l.lbl AS nl, count(*) AS c
        FROM und JOIN l1 l ON und.v = l.id
        WHERE l.lbl IS NOT NULL GROUP BY 1, 2),
      win2 AS (
        SELECT u AS id, nl AS win FROM (
          SELECT u, nl, row_number() OVER
            (PARTITION BY u ORDER BY c DESC, nl) AS rk
          FROM vote2) WHERE rk = 1),
      l2 AS (
        SELECT l1.id, l1.seed,
               COALESCE(l1.seed, w.win, l1.lbl) AS lbl
        FROM l1 LEFT JOIN win2 w ON l1.id = w.id)
      SELECT id AS vec_id, seed AS seed_label, lbl AS label
      FROM l2 ORDER BY vec_id
    """.trim))

  /** Top principal direction via relational power iteration
    * ([[LinAlg.powerIteration]], 4 rounds over the q214 covariance):
    * every order-sensitive sum (matvec entries, squared norm)
    * accumulates in decimal, so the whole iteration replays in SQL.
    */
  val q217PowerIteration = HarnessQuery(
    "q217_power_iteration",
    (spark, dir) =>
      LinAlg.powerIteration(
        LinAlg.covarianceMatrix(Tables.embeddings(spark, dir), "embedding", 64),
        "i", "j", "cov", dim = 64, rounds = 4)
        .orderBy(col("i")),
    Some("""
      WITH pr AS (
        SELECT g1.i AS i, g2.j AS j,
               CAST(CAST(embedding[g1.i + 1] AS DOUBLE)
                 * CAST(embedding[g2.j + 1] AS DOUBLE) AS DECIMAL(30,18)) AS p
        FROM embeddings,
             generate_series(0, 63) g1(i), generate_series(0, 63) g2(j)
        WHERE g1.i <= g2.j),
      gram AS (SELECT i, j, CAST(sum(p) AS DOUBLE) AS dot FROM pr GROUP BY 1, 2),
      s AS (
        SELECT g.i AS i,
               sum(CAST(CAST(embedding[g.i + 1] AS DOUBLE) AS DECIMAL(30,18))) AS sx,
               count(*) AS n
        FROM embeddings, generate_series(0, 63) g(i) GROUP BY 1),
      covq AS (
        SELECT gram.i AS i, gram.j AS j,
               round(gram.dot / si.n
                 - (CAST(si.sx AS DOUBLE) / si.n)
                   * (CAST(sj.sx AS DOUBLE) / sj.n), 12) AS a
        FROM gram JOIN s si ON gram.i = si.i JOIN s sj ON gram.j = sj.i),
      fm AS (
        SELECT i, j, a FROM covq
        UNION ALL SELECT j, i, a FROM covq WHERE i <> j),
      v0 AS (SELECT g.i AS j, 1.0 AS v FROM generate_series(0, 63) g(i)),
      mv1 AS (SELECT f.i, CAST(sum(CAST(f.a * v.v AS DECIMAL(38,18))) AS DOUBLE) AS u
              FROM fm f JOIN v0 v ON f.j = v.j GROUP BY 1),
      n1 AS (SELECT sqrt(CAST(sum(CAST(u * u AS DECIMAL(38,18))) AS DOUBLE)) AS nrm FROM mv1),
      v1 AS (SELECT i AS j, u / (SELECT nrm FROM n1) AS v FROM mv1),
      mv2 AS (SELECT f.i, CAST(sum(CAST(f.a * v.v AS DECIMAL(38,18))) AS DOUBLE) AS u
              FROM fm f JOIN v1 v ON f.j = v.j GROUP BY 1),
      n2 AS (SELECT sqrt(CAST(sum(CAST(u * u AS DECIMAL(38,18))) AS DOUBLE)) AS nrm FROM mv2),
      v2 AS (SELECT i AS j, u / (SELECT nrm FROM n2) AS v FROM mv2),
      mv3 AS (SELECT f.i, CAST(sum(CAST(f.a * v.v AS DECIMAL(38,18))) AS DOUBLE) AS u
              FROM fm f JOIN v2 v ON f.j = v.j GROUP BY 1),
      n3 AS (SELECT sqrt(CAST(sum(CAST(u * u AS DECIMAL(38,18))) AS DOUBLE)) AS nrm FROM mv3),
      v3 AS (SELECT i AS j, u / (SELECT nrm FROM n3) AS v FROM mv3),
      mv4 AS (SELECT f.i, CAST(sum(CAST(f.a * v.v AS DECIMAL(38,18))) AS DOUBLE) AS u
              FROM fm f JOIN v3 v ON f.j = v.j GROUP BY 1),
      n4 AS (SELECT sqrt(CAST(sum(CAST(u * u AS DECIMAL(38,18))) AS DOUBLE)) AS nrm FROM mv4),
      v4 AS (SELECT i AS j, u / (SELECT nrm FROM n4) AS v FROM mv4)
      SELECT CAST(j AS INT) AS i, round(v, 12) AS v,
             round((SELECT nrm FROM n4), 12) AS eigval
      FROM v4 ORDER BY i
    """.trim))

  /** Watermark sweep over simulated disordered ingest
    * ([[graft.operators.EventAnalytics.latenessAudit]]): arrival
    * order = md5(event_id) inside each user (the testdata arrives
    * perfectly time-ordered, so disorder is injected
    * deterministically), lateness vs the per-key running event-time
    * high-water mark, drop counts for four candidate watermarks.
    */
  val q218LatenessAudit = HarnessQuery(
    "q218_lateness_audit",
    (spark, dir) =>
      graft.operators.EventAnalytics.latenessAudit(
        Tables.events(spark, dir)
          .withColumn("arrival", md5(col("event_id").cast("string"))),
        "user_id", "ts", "arrival", Seq(0L, 3600L, 86400L, 604800L))
        .orderBy(col("threshold_sec")),
    Some("""
      WITH l AS (
        SELECT greatest(coalesce(max(epoch_us(CAST(ts AS TIMESTAMP))) OVER
          (PARTITION BY user_id ORDER BY md5(CAST(event_id AS VARCHAR))
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          - epoch_us(CAST(ts AS TIMESTAMP)), 0), 0) AS late_us
        FROM events),
      x AS (SELECT late_us, unnest([0, 3600, 86400, 604800]) AS threshold_sec FROM l),
      per AS (
        SELECT threshold_sec, count(*) AS n_events,
               CAST(sum(CASE WHEN late_us > CAST(threshold_sec AS BIGINT) * 1000000
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
               max(late_us) AS max_late_us
        FROM x GROUP BY 1)
      SELECT CAST(threshold_sec AS BIGINT) AS threshold_sec, n_events,
             n_dropped,
             round(CAST(n_dropped AS DOUBLE) / n_events, 12) AS drop_frac,
             max_late_us
      FROM per ORDER BY threshold_sec
    """.trim))

  /** Mergeable moment sketches per event type
    * ([[graft.operators.NumericFeatures.mergeableMoments]]): the
    * global row is assembled by MERGING the per-slice (n, sum,
    * sum-sq) triples, pinning the associative-merge algebra.
    */
  val q219MergeableMoments = HarnessQuery(
    "q219_mergeable_moments",
    (spark, dir) =>
      graft.operators.NumericFeatures.mergeableMoments(
        Tables.events(spark, dir), "event_type", "value")
        .orderBy(col("slice")),
    Some("""
      WITH per AS (
        SELECT event_type AS slice, count("value") AS n,
               sum(CAST("value" AS DECIMAL(28,6))) AS s,
               sum(CAST("value" AS DECIMAL(19,6))
                 * CAST("value" AS DECIMAL(19,6))) AS ss
        FROM events GROUP BY 1),
      merged AS (
        SELECT '__all' AS slice, CAST(sum(n) AS BIGINT) AS n,
               sum(s) AS s, sum(ss) AS ss
        FROM per),
      u AS (SELECT * FROM per UNION ALL SELECT * FROM merged)
      SELECT slice, n,
             round(CAST(s AS DOUBLE) / n, 10) AS mean,
             round(CAST(ss AS DOUBLE) / n
               - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 8)
               AS variance
      FROM u ORDER BY slice
    """.trim))

  /** Gini-Simpson diversity of event types per user
    * ([[graft.operators.EventAnalytics.diversityIndex]]):
    * integer-exact c^2 sums, one double division.
    */
  val q220Diversity = HarnessQuery(
    "q220_diversity",
    (spark, dir) =>
      graft.operators.EventAnalytics.diversityIndex(
        Tables.events(spark, dir), "user_id", "event_type")
        .orderBy(col("user_id")),
    Some("""
      WITH c AS (
        SELECT user_id, event_type, count(*) AS c
        FROM events GROUP BY 1, 2),
      a AS (
        SELECT user_id, CAST(sum(c) AS BIGINT) AS n, count(*) AS n_cats,
               sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS ss
        FROM c GROUP BY 1)
      SELECT user_id, n, n_cats,
             round(1.0 - CAST(ss AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 12) AS simpson,
             round(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
               / CAST(ss AS DOUBLE), 12) AS inv_simpson
      FROM a ORDER BY user_id
    """.trim))

  /** Cross-source quantile normalization
    * ([[graft.operators.NumericFeatures.quantileNormalize]], grid =
    * 2 decimals, sources = event types): every row's value mapped to
    * the same quantile of the global distribution via the
    * grid-bounded broadcast ECDF interval join.
    */
  val q221QuantileNorm = HarnessQuery(
    "q221_quantile_norm",
    (spark, dir) =>
      graft.operators.NumericFeatures.quantileNormalize(
        Tables.events(spark, dir).select("event_id", "event_type", "value"),
        "event_type", "value", gridDecimals = 2)
        .orderBy(col("event_id")),
    Some("""
      WITH s AS (
        SELECT event_id, event_type, "value",
               floor(CAST("value" AS DOUBLE) * 100.0 + 0.5) / 100.0 AS g
        FROM events),
      cum0 AS (SELECT g, count(*) AS cnt FROM s GROUP BY 1),
      cum AS (
        SELECT g AS tv,
               sum(cnt) OVER (ORDER BY g) - cnt AS cs,
               sum(cnt) OVER (ORDER BY g) AS ce
        FROM cum0),
      tot AS (SELECT count(*) AS n FROM s),
      r AS (
        SELECT event_id, event_type, "value",
               CAST(floor(percent_rank() OVER
                 (PARTITION BY event_type ORDER BY g)
                 * ((SELECT n FROM tot) - 1) + 0.5) AS BIGINT) AS k
        FROM s)
      SELECT r.event_id, r.event_type, r."value", cum.tv AS norm_value
      FROM r JOIN cum ON r.k >= cum.cs AND r.k < cum.ce
      ORDER BY event_id
    """.trim))

  /** SCD-type-2 validity intervals from the event log
    * ([[graft.operators.History.scd2]]): per-user runs of the same
    * event type collapsed into half-open [valid_from, valid_to)
    * intervals, deterministic under the (ts, event_id) tie-break.
    */
  val q222Scd2 = HarnessQuery(
    "q222_scd2",
    (spark, dir) =>
      graft.operators.History.scd2(
        Tables.events(spark, dir)
          .select("user_id", "ts", "event_type", "event_id"),
        "user_id", "ts", "event_type", "event_id")
        .select(col("user_id"), col("event_type"), col("n_observations"),
          unix_micros(col("valid_from")).as("valid_from_us"),
          unix_micros(col("valid_to")).as("valid_to_us"),
          col("is_current"))
        .orderBy(col("user_id"), col("valid_from_us")),
    Some("""
      WITH o AS (
        SELECT user_id, ts, event_type, event_id,
               lag(event_type) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
      c AS (
        SELECT user_id, ts, event_type,
               sum(CASE WHEN prev IS NOT DISTINCT FROM event_type
                 THEN 0 ELSE 1 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS run
        FROM o),
      r AS (
        SELECT user_id, run, min(ts) AS valid_from,
               min(event_type) AS event_type,
               count(*) AS n_observations
        FROM c GROUP BY 1, 2),
      f AS (
        SELECT user_id, valid_from, event_type, n_observations,
               lead(valid_from) OVER
                 (PARTITION BY user_id ORDER BY run) AS valid_to
        FROM r)
      SELECT user_id, event_type, n_observations,
             epoch_us(CAST(valid_from AS TIMESTAMP)) AS valid_from_us,
             epoch_us(CAST(valid_to AS TIMESTAMP)) AS valid_to_us,
             valid_to IS NULL AS is_current
      FROM f ORDER BY user_id, valid_from_us
    """.trim))

  /** Mann-Whitney U between even/odd event slices
    * ([[graft.operators.RankStats.mannWhitney]]): average ranks from
    * the distinct-value cumulative table (no global rank window),
    * doubled-integer exact U, one double z.
    */
  val q223MannWhitney = HarnessQuery(
    "q223_mann_whitney",
    (spark, dir) =>
      graft.operators.RankStats.mannWhitney(
        Tables.events(spark, dir)
          .withColumn("slice", pmod(col("event_id"), lit(2L))),
        "slice", "value"),
    Some("""
      WITH s AS (
        SELECT CAST(event_id % 2 AS VARCHAR) AS sl,
               CAST("value" AS DOUBLE) AS v
        FROM events WHERE "value" IS NOT NULL),
      rt AS (SELECT v, count(*) AS cnt FROM s GROUP BY 1),
      rk AS (
        SELECT v, (sum(cnt) OVER (ORDER BY v) - cnt)
                 + sum(cnt) OVER (ORDER BY v) + 1 AS r2
        FROM rt),
      j AS (SELECT s.sl, rk.r2 FROM s JOIN rk USING (v)),
      g AS (
        SELECT sl, count(*) AS n, sum(CAST(r2 AS HUGEINT)) AS r2s
        FROM j GROUP BY 1),
      w AS (
        SELECT (SELECT n FROM g ORDER BY sl LIMIT 1) AS n1,
               (SELECT n FROM g ORDER BY sl DESC LIMIT 1) AS n2,
               (SELECT r2s FROM g ORDER BY sl LIMIT 1) AS r2_1),
      u AS (
        SELECT n1, n2,
               r2_1 - CAST(n1 AS HUGEINT) * (n1 + 1) AS u2x1,
               CAST(2 AS HUGEINT) * n1 * n2
                 - (r2_1 - CAST(n1 AS HUGEINT) * (n1 + 1)) AS u2x2
        FROM w)
      SELECT n1, n2,
             CAST(u2x1 AS DOUBLE) / 2 AS u1,
             CAST(u2x2 AS DOUBLE) / 2 AS u2,
             round((CAST(u2x1 AS DOUBLE) / 2
                 - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2)
               / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1)
                 / 12), 9) AS z
      FROM u
    """.trim))

  /** Spearman's rho between event value and event time
    * ([[graft.operators.RankStats.spearman]]): Pearson on
    * doubled average ranks, exact wide-integer sums, one double
    * expression.
    */
  val q224Spearman = HarnessQuery(
    "q224_spearman",
    (spark, dir) =>
      graft.operators.RankStats.spearman(
        Tables.events(spark, dir)
          .select(col("value"),
            unix_micros(col("ts")).cast("double").as("tsd")),
        "value", "tsd"),
    Some("""
      WITH b AS (
        SELECT CAST("value" AS DOUBLE) AS x,
               CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE) AS y
        FROM events
        WHERE "value" IS NOT NULL AND ts IS NOT NULL),
      rxt AS (SELECT x AS v, count(*) AS cnt FROM b GROUP BY 1),
      rx AS (
        SELECT v, (sum(cnt) OVER (ORDER BY v) - cnt)
                 + sum(cnt) OVER (ORDER BY v) + 1 AS r2
        FROM rxt),
      ryt AS (SELECT y AS v, count(*) AS cnt FROM b GROUP BY 1),
      ry AS (
        SELECT v, (sum(cnt) OVER (ORDER BY v) - cnt)
                 + sum(cnt) OVER (ORDER BY v) + 1 AS r2
        FROM ryt),
      j AS (
        SELECT rx.r2 AS rxv, ry.r2 AS ryv
        FROM b JOIN rx ON b.x = rx.v JOIN ry ON b.y = ry.v),
      a AS (
        SELECT count(*) AS n,
               sum(CAST(rxv AS HUGEINT)) AS sx,
               sum(CAST(ryv AS HUGEINT)) AS sy,
               sum(CAST(rxv AS HUGEINT) * CAST(ryv AS HUGEINT)) AS sxy,
               sum(CAST(rxv AS HUGEINT) * CAST(rxv AS HUGEINT)) AS sxx,
               sum(CAST(ryv AS HUGEINT) * CAST(ryv AS HUGEINT)) AS syy
        FROM j)
      SELECT n,
             round((CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
               / sqrt((CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                 * (CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)), 9)
               AS rho
      FROM a
    """.trim))

  /** Seeded Laplace-noised category counts
    * ([[graft.operators.Privacy.dpNoisyCounts]], epsilon = 1, seed
    * 42): the DP-histogram release shape with reproducible
    * hash-derived noise through the Laplace inverse CDF.
    */
  val q225DpCounts = HarnessQuery(
    "q225_dp_counts",
    (spark, dir) =>
      graft.operators.Privacy.dpNoisyCounts(
        Tables.events(spark, dir), "event_type", epsilon = 1.0, seed = 42L)
        .orderBy(col("event_type")),
    Some("""
      WITH c AS (
        SELECT event_type, count(*) AS n FROM events GROUP BY 1),
      u AS (
        SELECT event_type, n,
               ((CAST(('0x' || substr(md5(event_type || ':' || '42'), 1, 15))
                 AS BIGINT) % 1000000) + 0.5) / 1000000.0 AS u
        FROM c)
      SELECT event_type, n,
             round(n + (-1.0 / 1.0) * sign(u - 0.5)
               * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noisy_n
      FROM u ORDER BY event_type
    """.trim))

  /** Out-of-vocabulary rate per document against the corpus top-20
    * vocabulary (tokenizer-coverage planning: which docs a vocab this
    * size would shred into byte fallbacks). Top-k vocab via
    * TakeOrdered (count desc, word asc — fully deterministic),
    * broadcast back over the token stream.
    */
  val q228OovRate = HarnessQuery(
    "q228_oov_rate",
    (spark, dir) => {
      import graft.functions.TextFunctions
      val toks = Tables.documents(spark, dir)
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("w"))
      val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("__c"))
        .orderBy(col("__c").desc, col("w")).limit(20)
        .select(col("w"), lit(1L).as("__in"))
      toks.join(broadcast(vocab), Seq("w"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          round(col("n_oov").cast("double") / col("n_tokens"), 12)
            .as("oov_rate"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH tk AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        FROM documents),
      vc AS (
        SELECT w FROM (SELECT w, count(*) AS c FROM tk GROUP BY 1)
        ORDER BY c DESC, w LIMIT 20),
      j AS (
        SELECT tk.doc_id,
               CASE WHEN vc.w IS NULL THEN 1 ELSE 0 END AS oov
        FROM tk LEFT JOIN vc ON tk.w = vc.w)
      SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(oov) AS BIGINT) AS n_oov,
             round(CAST(sum(oov) AS DOUBLE) / count(*), 12) AS oov_rate
      FROM j GROUP BY 1 ORDER BY doc_id
    """.trim))

  /** Split conformal coverage ([[graft.operators.Evaluation
    * .splitConformal]], per-event-type mean predictor, q = 0.9,
    * calibration = even event ids): the threshold is the exact
    * interpolated 90th percentile of calibration nonconformity, and
    * the reported coverage on odd ids audits the conformal guarantee.
    */
  val q230Conformal = HarnessQuery(
    "q230_conformal",
    (spark, dir) =>
      graft.operators.Evaluation.splitConformal(
        Tables.events(spark, dir), "value", "event_type",
        pmod(col("event_id"), lit(2L)) === 0, q = 0.9),
    Some("""
      WITH pred AS (
        SELECT event_type,
               CAST(sum(CAST("value" AS DECIMAL(28,6))) AS DOUBLE)
                 / count("value") AS pred
        FROM events WHERE event_id % 2 = 0 GROUP BY 1),
      calib AS (
        SELECT abs(CAST(e."value" AS DOUBLE) - p.pred) AS nc
        FROM events e JOIN pred p USING (event_type)
        WHERE e.event_id % 2 = 0),
      thr AS (
        SELECT quantile_cont(nc, 0.9) AS t, count(*) AS n_calib
        FROM calib),
      test AS (
        SELECT abs(CAST(e."value" AS DOUBLE) - p.pred) AS nc
        FROM events e JOIN pred p USING (event_type)
        WHERE e.event_id % 2 <> 0)
      SELECT round((SELECT t FROM thr), 9) AS threshold,
             (SELECT n_calib FROM thr) AS n_calib,
             count(*) AS n_test,
             round(CAST(sum(CASE WHEN nc <= (SELECT t FROM thr)
               THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 12) AS coverage
      FROM test
    """.trim))

  /** Forward-direction as-of join
    * ([[graft.operators.RangeJoin.asOfJoin]] direction = forward,
    * tolerance 19): each event matched to the NEXT mark at or above
    * its key — the "next maintenance window / next price tick" shape,
    * completing the backward/nearest harness coverage.
    */
  val q231AsofForward = HarnessQuery(
    "q231_asof_forward",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .withColumn("uk", pmod(col("user_id") * 7 + col("event_id"), lit(1000L)))
      val marks = Tables.nation(spark, dir).select(
        col("n_name"),
        (col("n_nationkey").cast("long") * 38L + 5L).as("lb"))
      graft.operators.RangeJoin.asOfJoin(ev, marks, "uk", "lb", "event_id",
        direction = "forward", tolerance = Some(19L))
        .select(col("event_id"), col("uk"),
          coalesce(col("n_name"), lit("none")).as("mark"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, uk, coalesce(n_name, 'none') AS mark
      FROM (SELECT event_id, (user_id * 7 + event_id) % 1000 AS uk FROM events) e
      LEFT JOIN (SELECT n_name, n_nationkey * 38 + 5 AS lb FROM nation) r
        ON r.lb >= e.uk AND r.lb - e.uk <= 19
      QUALIFY row_number() OVER (PARTITION BY event_id ORDER BY lb) = 1
      ORDER BY event_id
    """.trim))

  /** Running novel-action count: per event, how many DISTINCT event
    * types its user has exhibited up to and including that event —
    * windowed count-distinct done scalably as a first-occurrence flag
    * (per-(user, type) rank) plus a per-user running sum; no
    * collect_set state grows with history.
    */
  val q232NovelActions = HarnessQuery(
    "q232_novel_actions",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w1 = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(spark, dir)
        .withColumn("__first",
          when(row_number().over(w1) === 1, 1L).otherwise(0L))
        .withColumn("novel_types", sum(col("__first")).over(w2))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("novel_types"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH f AS (
        SELECT event_id, user_id, event_type, ts,
               CASE WHEN row_number() OVER
                 (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
                 THEN 1 ELSE 0 END AS first_seen
        FROM events)
      SELECT event_id, user_id, event_type,
             CAST(sum(first_seen) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS novel_types
      FROM f ORDER BY event_id
    """.trim))

  /** Training-format export: one svmlight-style line per event with
    * INTEGER-quantized features (hour, day-of-week, value bucket) —
    * integer-only string building so the serialized form is
    * byte-identical in any engine (double formatting never is). The
    * export shape a petabyte feature-matrix dump uses: pure
    * projection, no shuffle.
    */
  val q234SvmlightExport = HarnessQuery(
    "q234_svmlight_export",
    (spark, dir) =>
      Tables.events(spark, dir)
        .withColumn("__us", unix_micros(col("ts")))
        .select(col("event_id"),
          concat(
            when(pmod(col("event_id"), lit(10L)) === 0, lit(1L))
              .otherwise(lit(0L)).cast("string"),
            lit(" 1:"),
            // integer-only time arithmetic (`div`, not `/`): long
            // division in Spark SQL is DOUBLE division, and a
            // float-floored hour is exactly the kind of boundary bug
            // string exports make un-diffable
            expr("(__us div 3600000000) % 24").cast("string"),
            lit(" 2:"), expr("(__us div 86400000000) % 7").cast("string"),
            lit(" 3:"),
            floor(col("value") / 10.0).cast("long").cast("string"))
            .as("line"))
        .orderBy(col("event_id")),
    Some("""
      WITH e AS (
        SELECT event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               "value"
        FROM events)
      SELECT event_id,
             CAST(CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END AS VARCHAR)
             || ' 1:' || CAST((us // 3600000000) % 24 AS VARCHAR)
             || ' 2:' || CAST((us // 86400000000) % 7 AS VARCHAR)
             || ' 3:' || CAST(CAST(floor("value" / 10.0) AS BIGINT) AS VARCHAR)
               AS line
      FROM e ORDER BY event_id
    """.trim))

  /** Robust per-day trend of event value
    * ([[TimeSeries.theilSenTrend]], stride 5000): median of
    * deterministic stride-pair slopes — Theil-Sen's robustness at
    * O(n) pairs.
    */
  val q235TheilSen = HarnessQuery(
    "q235_theil_sen",
    (spark, dir) =>
      TimeSeries.theilSenTrend(
        Tables.events(spark, dir), "event_id", "ts", "value", stride = 5000L),
    Some("""
      WITH a AS (
        SELECT event_id AS ia, epoch_us(CAST(ts AS TIMESTAMP)) AS ta,
               CAST("value" AS DOUBLE) AS va
        FROM events),
      b AS (
        SELECT event_id - 5000 AS ia, epoch_us(CAST(ts AS TIMESTAMP)) AS tb,
               CAST("value" AS DOUBLE) AS vb
        FROM events),
      s AS (
        SELECT (vb - va) / (CAST(tb - ta AS DOUBLE) / (86400.0 * 1000000.0))
                 AS slope
        FROM a JOIN b USING (ia) WHERE tb <> ta)
      SELECT count(*) AS n_pairs,
             round(quantile_cont(slope, 0.5), 9) AS slope_per_day
      FROM s
    """.trim))

  /** Two-sample KS drift between document-source halves
    * ([[graft.operators.Evaluation.ksStatistic]] reused as a
    * two-sample test: membership in sources 0-9 is the "label", so
    * the pos/neg CDFs are the two slices' n_chars distributions) —
    * the corpus-drift monitor between ingestion pipelines.
    */
  val q237KsBySource = HarnessQuery(
    "q237_ks_by_source",
    (spark, dir) =>
      graft.operators.Evaluation.ksStatistic(
        Tables.documents(spark, dir).select(
          col("n_chars").cast("double").as("score"),
          when(substring(col("source"), 4, 10).cast("int") < 10, 1L)
            .otherwise(0L).as("label")),
        "score", "label")
        .withColumn("ks", round(col("ks"), 12)),
    Some("""
      WITH s AS (
        SELECT CAST(n_chars AS DOUBLE) AS score,
               CASE WHEN CAST(substr(source, 4) AS INT) < 10
                 THEN 1 ELSE 0 END AS label
        FROM documents),
      per AS (
        SELECT score,
               CAST(sum(label) AS BIGINT) AS pos_c,
               CAST(count(*) - sum(label) AS BIGINT) AS neg_c
        FROM s GROUP BY 1),
      tot AS (
        SELECT CAST(sum(pos_c) AS BIGINT) AS p,
               CAST(sum(neg_c) AS BIGINT) AS n
        FROM per),
      cum AS (
        SELECT score,
               sum(pos_c) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
               sum(neg_c) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
        FROM per)
      SELECT round(CAST(abs(CAST(cp AS HUGEINT) * (SELECT n FROM tot)
                          - CAST(cn AS HUGEINT) * (SELECT p FROM tot))
                     AS DOUBLE)
               / (CAST((SELECT p FROM tot) AS DOUBLE)
                  * CAST((SELECT n FROM tot) AS DOUBLE)), 12) AS ks,
             score AS ks_score
      FROM cum
      ORDER BY abs(CAST(cp AS HUGEINT) * (SELECT n FROM tot)
                 - CAST(cn AS HUGEINT) * (SELECT p FROM tot)) DESC,
               score ASC
      LIMIT 1
    """.trim))

  /** Inter-event gap distribution
    * ([[graft.operators.Sessions.gapStats]], candidate gap 1800 s):
    * the measured evidence behind the 30-minute session cut — exact
    * gap quantiles plus the fraction of gaps that cut would split.
    */
  val q238GapStats = HarnessQuery(
    "q238_gap_stats",
    (spark, dir) =>
      graft.operators.Sessions.gapStats(
        Tables.events(spark, dir), "user_id", "ts", "event_id", 1800L),
    Some("""
      WITH g AS (
        SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP))
                 - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                 AS DOUBLE) / 1000000.0 AS gap_s
        FROM events),
      gg AS (SELECT gap_s FROM g WHERE gap_s IS NOT NULL)
      SELECT count(*) AS n_gaps,
             round(quantile_cont(gap_s, 0.5), 6) AS p50_s,
             round(quantile_cont(gap_s, 0.9), 6) AS p90_s,
             round(quantile_cont(gap_s, 0.99), 6) AS p99_s,
             CAST(sum(CASE WHEN gap_s > 1800.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_over_gap,
             round(CAST(sum(CASE WHEN gap_s > 1800.0 THEN 1 ELSE 0 END)
               AS DOUBLE) / count(*), 12) AS split_frac
      FROM gg
    """.trim))

  /** Codegen'd single-pass token counter
    * ([[graft.functions.TokenCountExpr]]): whitespace-run counting
    * over raw UTF-8 bytes, zero allocation — versus the
    * `size(split(...))` form that materializes the token array per
    * row. The oracle counts non-whitespace runs, the expression's
    * exact contract.
    */
  val q239TokenCountExpr = HarnessQuery(
    "q239_token_count_expr",
    (spark, dir) =>
      Tables.documents(spark, dir)
        .select(col("doc_id"),
          graft.functions.TokenCountExpr.tokenCount(spark, col("text"))
            .as("n_tokens"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
      FROM documents ORDER BY doc_id
    """.trim))

  /** Feature-hashing document embeddings
    * ([[graft.operators.TextAnalysis.hashEmbedding]], dim 8, seed 7):
    * the zero-vocabulary hashing-trick featurizer in the long
    * (id, d, value) shape the similarity family consumes.
    */
  val q240HashEmbedding = HarnessQuery(
    "q240_hash_embedding",
    (spark, dir) =>
      graft.operators.TextAnalysis.hashEmbedding(
        Tables.documents(spark, dir).filter(col("doc_id") < 100),
        "doc_id", "text", dim = 8, seed = 7L)
        .orderBy(col("doc_id"), col("d")),
    Some("""
      WITH tk AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        FROM documents WHERE doc_id < 100),
      x AS (
        SELECT doc_id, g.d AS d,
               ((CAST(('0x' || substr(md5('7_' || w || '_' || g.d), 1, 15))
                 AS BIGINT) % 1000000) / 1000000.0 - 0.5) AS v
        FROM tk, generate_series(0, 7) g(d))
      SELECT doc_id, CAST(d AS INT) AS d,
             round(CAST(sum(CAST(v AS DECIMAL(30,18))) AS DOUBLE)
               / count(*), 12) AS value
      FROM x GROUP BY 1, 2 ORDER BY doc_id, d
    """.trim))

  /** Per-type trimmed mean of event value
    * ([[graft.operators.NumericFeatures.trimmedMeanByKey]],
    * [p05, p95] band): the robust location estimate beside the raw
    * mean it corrects.
    */
  val q241TrimmedMean = HarnessQuery(
    "q241_trimmed_mean",
    (spark, dir) =>
      graft.operators.NumericFeatures.trimmedMeanByKey(
        Tables.events(spark, dir), "event_type", "value")
        .orderBy(col("event_type")),
    Some("""
      WITH b AS (
        SELECT event_type,
               quantile_cont("value", 0.05) AS lo,
               quantile_cont("value", 0.95) AS hi
        FROM events GROUP BY 1),
      j AS (
        SELECT e.event_type, CAST(e."value" AS DOUBLE) AS v, b.lo, b.hi
        FROM events e JOIN b USING (event_type))
      SELECT event_type,
             count(v) AS n_total,
             CAST(sum(CASE WHEN v >= lo AND v <= hi THEN 1 ELSE 0 END)
               AS BIGINT) AS n_kept,
             round(CAST(sum(CASE WHEN v >= lo AND v <= hi
                 THEN CAST(v AS DECIMAL(28,6)) END) AS DOUBLE)
               / sum(CASE WHEN v >= lo AND v <= hi THEN 1 ELSE 0 END), 12)
               AS trimmed_mean,
             round(CAST(sum(CAST(v AS DECIMAL(28,6))) AS DOUBLE) / count(v), 12)
               AS raw_mean
      FROM j GROUP BY 1 ORDER BY 1
    """.trim))

  /** Size-weighted corpus sample without replacement
    * ([[graft.operators.Mixture.weightedSample]], Efraimidis–Spirakis
    * A-ES, k = 50, seed 42, weight = n_chars): big documents enter
    * with proportionally higher odds — the standard pick for "sample
    * a token budget's worth of docs" — and the full selection replays
    * in SQL from the md5-hash uniforms.
    */
  val q247WeightedSample = HarnessQuery(
    "q247_weighted_sample",
    (spark, dir) =>
      graft.operators.Mixture.weightedSample(
        Tables.documents(spark, dir), "doc_id", "n_chars", 50, 42L)
        .orderBy(col("doc_id")),
    Some("""
      WITH t AS (
        SELECT doc_id, n_chars,
               ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'),
                     1, 15)) AS BIGINT) + 0.5) / 1152921504606846976.0)
                 / CAST(n_chars AS DOUBLE) AS k
        FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
      top AS (
        SELECT doc_id, n_chars, round(k, 9) AS sample_key
        FROM t ORDER BY k DESC, doc_id LIMIT 50)
      SELECT doc_id, n_chars, sample_key FROM top ORDER BY doc_id
    """.trim))

  /** Deterministic Lloyd k-means fit ([[Clustering.lloydKMeans]]):
    * k = 8 explicit init centroids (the first 8 vectors), 3 fixed
    * rounds, decimal-exact assign distances and mean updates — so the
    * whole fit unrolls into plain SQL, round by round. Produces the
    * explicit centroid tables the ANN / semantic-dedup consumers take.
    */
  val q340KmeansFit = HarnessQuery(
    "q340_kmeans_fit",
    (spark, dir) => {
      val emb = Tables.embeddings(spark, dir)
      val init = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Clustering.lloydKMeans(emb, "vec_id", "embedding", init, rounds = 3)
        .orderBy(col("cid"), col("dim"))
    },
    Some("""
      WITH dims AS (
        SELECT vec_id AS id, i - 1 AS d, CAST(embedding[i] AS DOUBLE) AS x
        FROM (SELECT vec_id, embedding,
                     unnest(generate_series(1, len(embedding))) AS i
              FROM embeddings) t),
      c0 AS (SELECT id AS cid, d, x AS c FROM dims WHERE id < 8),
      d1 AS (SELECT dims.id, c.cid,
                    sum(CAST((dims.x - c.c) * (dims.x - c.c) AS DECIMAL(30,18))) AS d2
             FROM dims JOIN c0 c ON dims.d = c.d GROUP BY 1, 2),
      a1 AS (SELECT id, cid FROM (
               SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rk
               FROM d1) z WHERE rk = 1),
      u1 AS (SELECT a.cid, dims.d,
                    round(CAST(sum(CAST(dims.x AS DECIMAL(30,18))) AS DOUBLE) / count(*), 12) AS c
             FROM dims JOIN a1 a USING (id) GROUP BY 1, 2),
      c1 AS (SELECT c0.cid, c0.d, coalesce(u1.c, c0.c) AS c
             FROM c0 LEFT JOIN u1 ON c0.cid = u1.cid AND c0.d = u1.d),
      d2r AS (SELECT dims.id, c.cid,
                     sum(CAST((dims.x - c.c) * (dims.x - c.c) AS DECIMAL(30,18))) AS d2
              FROM dims JOIN c1 c ON dims.d = c.d GROUP BY 1, 2),
      a2 AS (SELECT id, cid FROM (
               SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rk
               FROM d2r) z WHERE rk = 1),
      u2 AS (SELECT a.cid, dims.d,
                    round(CAST(sum(CAST(dims.x AS DECIMAL(30,18))) AS DOUBLE) / count(*), 12) AS c
             FROM dims JOIN a2 a USING (id) GROUP BY 1, 2),
      c2 AS (SELECT c1.cid, c1.d, coalesce(u2.c, c1.c) AS c
             FROM c1 LEFT JOIN u2 ON c1.cid = u2.cid AND c1.d = u2.d),
      d3r AS (SELECT dims.id, c.cid,
                     sum(CAST((dims.x - c.c) * (dims.x - c.c) AS DECIMAL(30,18))) AS d2
              FROM dims JOIN c2 c ON dims.d = c.d GROUP BY 1, 2),
      a3 AS (SELECT id, cid FROM (
               SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rk
               FROM d3r) z WHERE rk = 1),
      u3 AS (SELECT a.cid, dims.d,
                    round(CAST(sum(CAST(dims.x AS DECIMAL(30,18))) AS DOUBLE) / count(*), 12) AS c
             FROM dims JOIN a3 a USING (id) GROUP BY 1, 2),
      c3 AS (SELECT c2.cid, c2.d, coalesce(u3.c, c2.c) AS c
             FROM c2 LEFT JOIN u3 ON c2.cid = u3.cid AND c2.d = u3.d)
      SELECT cid, d AS dim, c AS coord FROM c3 ORDER BY cid, dim
    """.trim))

  /** Cell audit of the fitted k-means: per-cell member count and
    * decimal-exact inertia under one more nearest-centroid assignment
    * ([[Clustering.kmeansCells]]) — the skew/quality check a 100 TB
    * IVF build runs before freezing its centroid table.
    */
  val q341KmeansCells = HarnessQuery(
    "q341_kmeans_cells",
    (spark, dir) => {
      val emb = Tables.embeddings(spark, dir)
      val init = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val cent = Clustering.lloydKMeans(emb, "vec_id", "embedding", init, rounds = 3)
      Clustering.kmeansCells(emb, "vec_id", "embedding", cent)
        .orderBy(col("cid"))
    },
    Some("""
      WITH dims AS (
        SELECT vec_id AS id, i - 1 AS d, CAST(embedding[i] AS DOUBLE) AS x
        FROM (SELECT vec_id, embedding,
                     unnest(generate_series(1, len(embedding))) AS i
              FROM embeddings) t),
      c0 AS (SELECT id AS cid, d, x AS c FROM dims WHERE id < 8),
      d1 AS (SELECT dims.id, c.cid,
                    sum(CAST((dims.x - c.c) * (dims.x - c.c) AS DECIMAL(30,18))) AS d2
             FROM dims JOIN c0 c ON dims.d = c.d GROUP BY 1, 2),
      a1 AS (SELECT id, cid FROM (
               SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rk
               FROM d1) z WHERE rk = 1),
      u1 AS (SELECT a.cid, dims.d,
                    round(CAST(sum(CAST(dims.x AS DECIMAL(30,18))) AS DOUBLE) / count(*), 12) AS c
             FROM dims JOIN a1 a USING (id) GROUP BY 1, 2),
      c1 AS (SELECT c0.cid, c0.d, coalesce(u1.c, c0.c) AS c
             FROM c0 LEFT JOIN u1 ON c0.cid = u1.cid AND c0.d = u1.d),
      d2r AS (SELECT dims.id, c.cid,
                     sum(CAST((dims.x - c.c) * (dims.x - c.c) AS DECIMAL(30,18))) AS d2
              FROM dims JOIN c1 c ON dims.d = c.d GROUP BY 1, 2),
      a2 AS (SELECT id, cid FROM (
               SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rk
               FROM d2r) z WHERE rk = 1),
      u2 AS (SELECT a.cid, dims.d,
                    round(CAST(sum(CAST(dims.x AS DECIMAL(30,18))) AS DOUBLE) / count(*), 12) AS c
             FROM dims JOIN a2 a USING (id) GROUP BY 1, 2),
      c2 AS (SELECT c1.cid, c1.d, coalesce(u2.c, c1.c) AS c
             FROM c1 LEFT JOIN u2 ON c1.cid = u2.cid AND c1.d = u2.d),
      d3r AS (SELECT dims.id, c.cid,
                     sum(CAST((dims.x - c.c) * (dims.x - c.c) AS DECIMAL(30,18))) AS d2
              FROM dims JOIN c2 c ON dims.d = c.d GROUP BY 1, 2),
      a3 AS (SELECT id, cid FROM (
               SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rk
               FROM d3r) z WHERE rk = 1),
      u3 AS (SELECT a.cid, dims.d,
                    round(CAST(sum(CAST(dims.x AS DECIMAL(30,18))) AS DOUBLE) / count(*), 12) AS c
             FROM dims JOIN a3 a USING (id) GROUP BY 1, 2),
      c3 AS (SELECT c2.cid, c2.d, coalesce(u3.c, c2.c) AS c
             FROM c2 LEFT JOIN u3 ON c2.cid = u3.cid AND c2.d = u3.d),
      d4 AS (SELECT dims.id, c.cid,
                    sum(CAST((dims.x - c.c) * (dims.x - c.c) AS DECIMAL(30,18))) AS d2
             FROM dims JOIN c3 c ON dims.d = c.d GROUP BY 1, 2),
      a4 AS (SELECT id, cid, d2 FROM (
               SELECT id, cid, d2, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rk
               FROM d4) z WHERE rk = 1)
      SELECT cid, count(*) AS n_members, round(CAST(sum(d2) AS DOUBLE), 12) AS inertia
      FROM a4 GROUP BY cid ORDER BY cid
    """.trim))

  /** Producer-to-consumer composition: [[Clustering.lloydKMeans]] fits
    * the coarse quantizer (3 rounds, k = 8), [[Clustering.assembleCentroids]]
    * freezes it into the (cell, cvec) table, and
    * [[graft.operators.Similarity.ivfSearchTopK]] serves ANN top-5
    * through it (nprobe = 4) — the full IVF index build + search story
    * in one dataflow, replayed end-to-end in SQL.
    */
  val q342KmeansIvf = HarnessQuery(
    "q342_kmeans_ivf",
    (spark, dir) => {
      val em = Tables.embeddings(spark, dir)
      val init = em.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val cent = Clustering.assembleCentroids(
        Clustering.lloydKMeans(em, "vec_id", "embedding", init, rounds = 3))
      graft.operators.Similarity.ivfSearchTopK(
        em, em.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, centroids = cent, nprobe = 4)
        .withColumn("cosine", round(col("cosine"), 12))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""
      WITH dims AS (
        SELECT vec_id AS id, i - 1 AS d, CAST(embedding[i] AS DOUBLE) AS x
        FROM (SELECT vec_id, embedding,
                     unnest(generate_series(1, len(embedding))) AS i
              FROM embeddings) t),
      c0 AS (SELECT id AS cid, d, x AS c FROM dims WHERE id < 8),
      d1 AS (SELECT dims.id, c.cid,
                    sum(CAST((dims.x - c.c) * (dims.x - c.c) AS DECIMAL(30,18))) AS d2
             FROM dims JOIN c0 c ON dims.d = c.d GROUP BY 1, 2),
      a1 AS (SELECT id, cid FROM (
               SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rk
               FROM d1) z WHERE rk = 1),
      u1 AS (SELECT a.cid, dims.d,
                    round(CAST(sum(CAST(dims.x AS DECIMAL(30,18))) AS DOUBLE) / count(*), 12) AS c
             FROM dims JOIN a1 a USING (id) GROUP BY 1, 2),
      c1 AS (SELECT c0.cid, c0.d, coalesce(u1.c, c0.c) AS c
             FROM c0 LEFT JOIN u1 ON c0.cid = u1.cid AND c0.d = u1.d),
      d2r AS (SELECT dims.id, c.cid,
                     sum(CAST((dims.x - c.c) * (dims.x - c.c) AS DECIMAL(30,18))) AS d2
              FROM dims JOIN c1 c ON dims.d = c.d GROUP BY 1, 2),
      a2 AS (SELECT id, cid FROM (
               SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rk
               FROM d2r) z WHERE rk = 1),
      u2 AS (SELECT a.cid, dims.d,
                    round(CAST(sum(CAST(dims.x AS DECIMAL(30,18))) AS DOUBLE) / count(*), 12) AS c
             FROM dims JOIN a2 a USING (id) GROUP BY 1, 2),
      c2 AS (SELECT c1.cid, c1.d, coalesce(u2.c, c1.c) AS c
             FROM c1 LEFT JOIN u2 ON c1.cid = u2.cid AND c1.d = u2.d),
      d3r AS (SELECT dims.id, c.cid,
                     sum(CAST((dims.x - c.c) * (dims.x - c.c) AS DECIMAL(30,18))) AS d2
              FROM dims JOIN c2 c ON dims.d = c.d GROUP BY 1, 2),
      a3 AS (SELECT id, cid FROM (
               SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rk
               FROM d3r) z WHERE rk = 1),
      u3 AS (SELECT a.cid, dims.d,
                    round(CAST(sum(CAST(dims.x AS DECIMAL(30,18))) AS DOUBLE) / count(*), 12) AS c
             FROM dims JOIN a3 a USING (id) GROUP BY 1, 2),
      c3 AS (SELECT c2.cid, c2.d, coalesce(u3.c, c2.c) AS c
             FROM c2 LEFT JOIN u3 ON c2.cid = u3.cid AND c2.d = u3.d),
      cn AS (SELECT cid AS cell,
                    sqrt(CAST(sum(CAST(c * c AS DECIMAL(30,18))) AS DOUBLE)) AS cnrm
             FROM c3 GROUP BY 1),
      n AS (SELECT id AS vec_id,
                   sqrt(CAST(sum(CAST(x * x AS DECIMAL(30,18))) AS DOUBLE)) AS nrm
            FROM dims GROUP BY 1),
      acos AS (SELECT dims.id AS vec_id, c3.cid AS cell,
                      CAST(sum(CAST(dims.x * c3.c AS DECIMAL(30,18))) AS DOUBLE) AS dot
               FROM dims JOIN c3 ON dims.d = c3.d GROUP BY 1, 2),
      asim AS (SELECT a.vec_id, a.cell, a.dot / (n.nrm * cn.cnrm) AS csim
               FROM acos a JOIN n USING (vec_id) JOIN cn USING (cell)),
      assign AS (SELECT vec_id, cell FROM (
                   SELECT vec_id, cell,
                          row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS r
                   FROM asim) z WHERE r = 1),
      probe AS (SELECT vec_id AS query_id, cell FROM (
                  SELECT vec_id, cell,
                         row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS r
                  FROM asim WHERE vec_id < 10) z WHERE r <= 4),
      cand AS (SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
               FROM probe p JOIN assign a USING (cell)
               WHERE a.vec_id <> p.query_id),
      scored AS (SELECT cand.query_id, cand.neighbor_id,
                        CAST(sum(CAST(qd.x * cd.x AS DECIMAL(30,18))) AS DOUBLE) AS dot
                 FROM cand
                 JOIN dims qd ON qd.id = cand.query_id
                 JOIN dims cd ON cd.id = cand.neighbor_id AND cd.d = qd.d
                 GROUP BY 1, 2),
      ranked AS (SELECT s.query_id, s.neighbor_id,
                        s.dot / (nq.nrm * nc.nrm) AS cosine,
                        row_number() OVER (PARTITION BY s.query_id
                          ORDER BY s.dot / (nq.nrm * nc.nrm) DESC, s.neighbor_id) AS rank
                 FROM scored s
                 JOIN n nq ON nq.vec_id = s.query_id
                 JOIN n nc ON nc.vec_id = s.neighbor_id)
      SELECT query_id, rank, neighbor_id, round(cosine, 12) AS cosine
      FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """.trim))

  /** Skip-gram training pairs with derandomized word2vec frequency
    * subsampling ([[Collocations.skipgramPairs]]): the md5-uniform of
    * (doc, pos, word) stands in for rand() in the Mikolov keep rule,
    * survivors re-index so windows span deletions, and the +-2 window
    * pairs aggregate to (center, context, n_pairs >= 2). Every draw
    * replays exactly in SQL.
    */
  val q344Skipgram = HarnessQuery(
    "q344_skipgram",
    (spark, dir) =>
      Collocations.skipgramPairs(
        Tables.documents(spark, dir), "doc_id", "text",
        window = 2, sampleT = 0.01, minCount = 2L)
        .orderBy(col("center"), col("context")),
    Some("""
      WITH tok0 AS (SELECT doc_id AS doc,
                      unnest(generate_series(1, len(regexp_split_to_array(trim(lower(text)), '\s+')))) AS i,
                      regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                    FROM documents),
      tok AS (SELECT doc, i - 1 AS p, toks[i] AS w FROM tok0 WHERE toks[i] <> ''),
      freq AS (SELECT w, count(*) AS n FROM tok GROUP BY 1),
      tot AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM freq),
      surv AS (SELECT doc, w,
                 row_number() OVER (PARTITION BY doc ORDER BY p) AS np
               FROM tok JOIN freq USING (w), tot
               WHERE CAST(CAST(('0x' || substr(md5(concat_ws(':', doc, p, w)), 1, 15)) AS BIGINT) AS DOUBLE)
                       / 1152921504606846976.0
                     < least(1.0, sqrt(0.01 / (CAST(n AS DOUBLE) / tot))
                                  + 0.01 / (CAST(n AS DOUBLE) / tot))),
      pairs AS (SELECT c.w AS center, x.w AS context
                FROM surv c JOIN surv x
                  ON c.doc = x.doc
                 AND x.np BETWEEN c.np - 2 AND c.np + 2
                 AND x.np <> c.np)
      SELECT center, context, count(*) AS n_pairs
      FROM pairs GROUP BY 1, 2 HAVING count(*) >= 2
      ORDER BY center, context
    """.trim))

  /** Greedy k-center coreset selection ([[graft.operators.Selection
    * .kCenterGreedy]], seed vec_id 0, k = 6): each pick is the corpus
    * point farthest (decimal-exact squared-L2) from the chosen set,
    * ties to the lowest id — the diversity sampler, with the covering-
    * radius curve alongside. Fully declarative (the per-round argmax
    * is a one-row sort-limit, not a collect); the oracle unrolls all
    * five selection rounds.
    */
  val q346KCenter = HarnessQuery(
    "q346_kcenter",
    (spark, dir) =>
      graft.operators.Selection.kCenterGreedy(
        Tables.embeddings(spark, dir), "vec_id", "embedding",
        seedId = 0L, k = 6)
        .orderBy(col("rank")),
    Some {
      val round = (r: Int) => {
        val prev = s"m${r - 1}"
        val mNext = if (r < 6) s""",
      m$r AS (SELECT a.id, least(a.dist, b.dist) AS dist
              FROM $prev a JOIN (
                SELECT dims.id,
                       sum(CAST((dims.x - c.x) * (dims.x - c.x) AS DECIMAL(30,18))) AS dist
                FROM dims JOIN (SELECT d, x FROM dims
                                WHERE id = (SELECT id FROM p$r)) c ON dims.d = c.d
                GROUP BY 1) b ON a.id = b.id)""" else ""
        s"""
      p$r AS (SELECT id, dist FROM $prev ORDER BY dist DESC, id LIMIT 1)$mNext,"""
      }
      s"""
      WITH dims AS (
        SELECT vec_id AS id, i - 1 AS d, CAST(embedding[i] AS DOUBLE) AS x
        FROM (SELECT vec_id, embedding,
                     unnest(generate_series(1, len(embedding))) AS i
              FROM embeddings) t),
      m1 AS (SELECT dims.id,
                    sum(CAST((dims.x - c.x) * (dims.x - c.x) AS DECIMAL(30,18))) AS dist
             FROM dims JOIN (SELECT d, x FROM dims WHERE id = 0) c ON dims.d = c.d
             GROUP BY 1),
      ${(2 to 6).map(round).mkString("")}
      sel AS (
        SELECT CAST(1 AS BIGINT) AS rank, CAST(0 AS BIGINT) AS center_id,
               CAST(0 AS DECIMAL(38,18)) AS raw
        ${(2 to 6).map(r => s"UNION ALL SELECT $r, id, dist FROM p$r").mkString("\n        ")})
      SELECT rank, center_id, round(CAST(raw AS DOUBLE), 12) AS dist_to_set
      FROM sel ORDER BY rank
      """.trim
    })

  /** Top-2 PCA ([[LinAlg.topTwoComponents]]): power iteration on the
    * embedding covariance, Hotelling deflation with the 12dp-rounded
    * first component (the rounding is the deflation contract), a
    * second power iteration, and per-component explained-variance
    * fractions — the two-line scree replayed exactly in SQL.
    */
  val q358Pca2 = HarnessQuery(
    "q358_pca2",
    (spark, dir) =>
      LinAlg.topTwoComponents(
        LinAlg.covarianceMatrix(Tables.embeddings(spark, dir), "embedding", 64),
        "i", "j", "cov", dim = 64, rounds = 4)
        .orderBy(col("component"), col("i")),
    Some {
      val pow = (fm: String, p: String) => (1 to 4).map { r =>
        val prev = s"$p${r - 1}"
        s"""
      ${p}mv$r AS MATERIALIZED (SELECT f.i, CAST(sum(CAST(f.a * v.v AS DECIMAL(38,18))) AS DOUBLE) AS u
              FROM $fm f JOIN $prev v ON f.j = v.j GROUP BY 1),
      ${p}n$r AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(u * u AS DECIMAL(38,18))) AS DOUBLE)) AS nrm FROM ${p}mv$r),
      $p$r AS MATERIALIZED (SELECT i AS j, u / (SELECT nrm FROM ${p}n$r) AS v FROM ${p}mv$r),"""
      }.mkString("")
      s"""
      WITH pr AS (
        SELECT g1.i AS i, g2.j AS j,
               CAST(CAST(embedding[g1.i + 1] AS DOUBLE)
                 * CAST(embedding[g2.j + 1] AS DOUBLE) AS DECIMAL(30,18)) AS p
        FROM embeddings,
             generate_series(0, 63) g1(i), generate_series(0, 63) g2(j)
        WHERE g1.i <= g2.j),
      gram AS MATERIALIZED (SELECT i, j, CAST(sum(p) AS DOUBLE) AS dot FROM pr GROUP BY 1, 2),
      s AS MATERIALIZED (
        SELECT g.i AS i,
               sum(CAST(CAST(embedding[g.i + 1] AS DOUBLE) AS DECIMAL(30,18))) AS sx,
               count(*) AS n
        FROM embeddings, generate_series(0, 63) g(i) GROUP BY 1),
      covq AS MATERIALIZED (
        SELECT gram.i AS i, gram.j AS j,
               round(gram.dot / si.n
                 - (CAST(si.sx AS DOUBLE) / si.n)
                   * (CAST(sj.sx AS DOUBLE) / sj.n), 12) AS a
        FROM gram JOIN s si ON gram.i = si.i JOIN s sj ON gram.j = sj.i),
      fm AS MATERIALIZED (SELECT i, j, a FROM covq
             UNION ALL SELECT j, i, a FROM covq WHERE i <> j),
      x0 AS MATERIALIZED (SELECT g.i AS j, 1.0 AS v FROM generate_series(0, 63) g(i)),
      ${pow("fm", "x")}
      w1 AS MATERIALIZED (SELECT CAST(j AS INT) AS i, round(v, 12) AS v,
                    round((SELECT nrm FROM xn4), 12) AS l
             FROM x4),
      cov2 AS MATERIALIZED (SELECT c.i, c.j, c.a - wi.l * wi.v * wj.v AS a
               FROM covq c JOIN w1 wi ON c.i = wi.i JOIN w1 wj ON c.j = wj.i),
      fm2 AS MATERIALIZED (SELECT i, j, a FROM cov2
              UNION ALL SELECT j, i, a FROM cov2 WHERE i <> j),
      y0 AS MATERIALIZED (SELECT g.i AS j, 1.0 + g.i AS v FROM generate_series(0, 63) g(i)),
      ${pow("fm2", "y")}
      w2 AS (SELECT CAST(j AS INT) AS i, round(v, 12) AS v,
                    round((SELECT nrm FROM yn4), 12) AS l
             FROM y4),
      tr AS MATERIALIZED (SELECT CAST(sum(CAST(a AS DECIMAL(38,12))) AS DOUBLE) AS t
             FROM covq WHERE i = j),
      unioned AS MATERIALIZED (
        SELECT 1 AS component, i, v, l AS eigval FROM w1
        UNION ALL
        SELECT 2 AS component, i, v, l AS eigval FROM w2)
      SELECT component, i, v, eigval,
             round(eigval / tr.t, 12) AS explained
      FROM unioned, tr
      ORDER BY component, i
      """.trim
    })

  /** PCA reconstruction-error outliers
    * ([[LinAlg.reconstructionOutliers]] over the q358 fit): the 15
    * embeddings the top-2 principal subspace explains WORST —
    * residual² = ‖x‖² − Σ (x·v_c)², the embedding-space anomaly sweep
    * a curation pass quarantines before training.
    */
  val q359PcaOutliers = HarnessQuery(
    "q359_pca_outliers",
    (spark, dir) => {
      val em = Tables.embeddings(spark, dir)
      val comps = LinAlg.topTwoComponents(
        LinAlg.covarianceMatrix(em, "embedding", 64),
        "i", "j", "cov", dim = 64, rounds = 4)
      LinAlg.reconstructionOutliers(em, "vec_id", "embedding", comps, topN = 15)
        .orderBy(col("residual_sq").desc, col("vec_id"))
    },
    Some {
      val pow = (fm: String, p: String) => (1 to 4).map { r =>
        val prev = s"$p${r - 1}"
        s"""
      ${p}mv$r AS MATERIALIZED (SELECT f.i, CAST(sum(CAST(f.a * v.v AS DECIMAL(38,18))) AS DOUBLE) AS u
              FROM $fm f JOIN $prev v ON f.j = v.j GROUP BY 1),
      ${p}n$r AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(u * u AS DECIMAL(38,18))) AS DOUBLE)) AS nrm FROM ${p}mv$r),
      $p$r AS MATERIALIZED (SELECT i AS j, u / (SELECT nrm FROM ${p}n$r) AS v FROM ${p}mv$r),"""
      }.mkString("")
      s"""
      WITH pr AS MATERIALIZED (
        SELECT g1.i AS i, g2.j AS j,
               CAST(CAST(embedding[g1.i + 1] AS DOUBLE)
                 * CAST(embedding[g2.j + 1] AS DOUBLE) AS DECIMAL(30,18)) AS p
        FROM embeddings,
             generate_series(0, 63) g1(i), generate_series(0, 63) g2(j)
        WHERE g1.i <= g2.j),
      gram AS MATERIALIZED (SELECT i, j, CAST(sum(p) AS DOUBLE) AS dot FROM pr GROUP BY 1, 2),
      s AS MATERIALIZED (
        SELECT g.i AS i,
               sum(CAST(CAST(embedding[g.i + 1] AS DOUBLE) AS DECIMAL(30,18))) AS sx,
               count(*) AS n
        FROM embeddings, generate_series(0, 63) g(i) GROUP BY 1),
      covq AS MATERIALIZED (
        SELECT gram.i AS i, gram.j AS j,
               round(gram.dot / si.n
                 - (CAST(si.sx AS DOUBLE) / si.n)
                   * (CAST(sj.sx AS DOUBLE) / sj.n), 12) AS a
        FROM gram JOIN s si ON gram.i = si.i JOIN s sj ON gram.j = sj.i),
      fm AS MATERIALIZED (SELECT i, j, a FROM covq
             UNION ALL SELECT j, i, a FROM covq WHERE i <> j),
      x0 AS MATERIALIZED (SELECT g.i AS j, 1.0 AS v FROM generate_series(0, 63) g(i)),
      ${pow("fm", "x")}
      w1 AS MATERIALIZED (SELECT CAST(j AS INT) AS i, round(v, 12) AS v,
                    round((SELECT nrm FROM xn4), 12) AS l
             FROM x4),
      cov2 AS MATERIALIZED (SELECT c.i, c.j, c.a - wi.l * wi.v * wj.v AS a
               FROM covq c JOIN w1 wi ON c.i = wi.i JOIN w1 wj ON c.j = wj.i),
      fm2 AS MATERIALIZED (SELECT i, j, a FROM cov2
              UNION ALL SELECT j, i, a FROM cov2 WHERE i <> j),
      y0 AS MATERIALIZED (SELECT g.i AS j, 1.0 + g.i AS v FROM generate_series(0, 63) g(i)),
      ${pow("fm2", "y")}
      w2 AS MATERIALIZED (SELECT CAST(j AS INT) AS i, round(v, 12) AS v FROM y4),
      loads AS MATERIALIZED (
        SELECT 1 AS c, i AS d, v FROM w1
        UNION ALL SELECT 2 AS c, i AS d, v FROM w2),
      dims AS MATERIALIZED (
        SELECT vec_id AS id, g.i AS d, CAST(embedding[g.i + 1] AS DOUBLE) AS x
        FROM embeddings, generate_series(0, 63) g(i)),
      proj AS MATERIALIZED (
        SELECT d0.id, l.c,
               CAST(sum(CAST(d0.x * l.v AS DECIMAL(38,18))) AS DOUBLE) AS p
        FROM dims d0 JOIN loads l ON d0.d = l.d
        GROUP BY 1, 2),
      expl AS MATERIALIZED (
        SELECT id, CAST(sum(CAST(p * p AS DECIMAL(38,18))) AS DOUBLE) AS e
        FROM proj GROUP BY 1),
      nrm2 AS MATERIALIZED (
        SELECT id, CAST(sum(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS n2
        FROM dims GROUP BY 1)
      SELECT id AS vec_id, round(n2 - e, 9) AS residual_sq
      FROM nrm2 JOIN expl USING (id)
      ORDER BY residual_sq DESC, vec_id
      LIMIT 15
      """.trim
    })

  /** Embedding centroid drift ([[LinAlg.centroidDrift]]) across 7
    * synthetic snapshots (vec_id mod 7 — the corpus carries no
    * timestamps): consecutive-snapshot L2 distance between the
    * 12dp-snapped decimal mean vectors — the cheapest distribution
    * drift alarm, exact in SQL.
    */
  val q360CentroidDrift = HarnessQuery(
    "q360_centroid_drift",
    (spark, dir) =>
      LinAlg.centroidDrift(
        Tables.embeddings(spark, dir)
          .withColumn("snap", pmod(col("vec_id"), lit(7L))),
        "snap", "embedding")
        .orderBy(col("snap")),
    Some("""
      WITH dims AS (
        SELECT vec_id % 7 AS s, g.i AS d,
               CAST(embedding[g.i + 1] AS DOUBLE) AS x
        FROM embeddings, generate_series(0, 63) g(i)),
      m AS (SELECT s, d,
                   round(CAST(sum(CAST(x AS DECIMAL(30,18))) AS DOUBLE)
                         / count(*), 12) AS m
            FROM dims GROUP BY 1, 2),
      p AS (SELECT s, d, m,
                   lag(m) OVER (PARTITION BY d ORDER BY s) AS prev
            FROM m)
      SELECT s AS snap,
             round(sqrt(CAST(sum(CAST((m - prev) * (m - prev)
               AS DECIMAL(38,18))) AS DOUBLE)), 12) AS drift_l2
      FROM p WHERE prev IS NOT NULL
      GROUP BY 1 ORDER BY snap
    """.trim))

  /** MMR exemplar selection ([[graft.operators.Selection.mmrSelect]],
    * k = 6, lambda = 0.75): greedy centrality-vs-diversity picks over
    * the embedding corpus — relevance is cosine to the exact centroid,
    * the penalty is max cosine to the already-picked set, every cosine
    * decimal-exact and rounded at 12 before comparison. The oracle
    * unrolls all six selection rounds.
    */
  val q366Mmr = HarnessQuery(
    "q366_mmr",
    (spark, dir) =>
      graft.operators.Selection.mmrSelect(
        Tables.embeddings(spark, dir), "vec_id", "embedding",
        k = 6, lambda = 0.75)
        .orderBy(col("rank")),
    Some {
      val round = (r: Int) => {
        val p = s"p${r - 1}"
        s"""
      s$r AS MATERIALIZED (
        SELECT s.id, s.rel,
               greatest(s.ms, round(m.dot
                 / (norms.n * (SELECT n FROM norms
                               WHERE id = (SELECT id FROM $p))), 12)) AS ms
        FROM s${r - 1} s
        JOIN (SELECT dims.id,
                     CAST(sum(CAST(dims.x * pd.x AS DECIMAL(38,18))) AS DOUBLE) AS dot
              FROM dims JOIN (SELECT d, x FROM dims
                              WHERE id = (SELECT id FROM $p)) pd USING (d)
              GROUP BY 1) m ON s.id = m.id
        JOIN norms ON s.id = norms.id
        WHERE s.id <> (SELECT id FROM $p)),
      p$r AS MATERIALIZED (
        SELECT id, round(0.75 * rel - 0.25 * ms, 12) AS sc
        FROM s$r ORDER BY sc DESC, id LIMIT 1),"""
      }
      s"""
      WITH dims AS MATERIALIZED (
        SELECT vec_id AS id, i - 1 AS d, CAST(embedding[i] AS DOUBLE) AS x
        FROM (SELECT vec_id, embedding,
                     unnest(generate_series(1, len(embedding))) AS i
              FROM embeddings) t),
      norms AS MATERIALIZED (
        SELECT id, sqrt(CAST(sum(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE)) AS n
        FROM dims GROUP BY 1),
      cent AS MATERIALIZED (
        SELECT d, CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE)
                  / (SELECT count(*) FROM embeddings) AS c
        FROM dims GROUP BY 1),
      cnorm AS (SELECT sqrt(CAST(sum(CAST(c * c AS DECIMAL(38,18))) AS DOUBLE)) AS cn
                FROM cent),
      rel0 AS (SELECT dims.id,
                      CAST(sum(CAST(dims.x * cent.c AS DECIMAL(38,18))) AS DOUBLE) AS dot
               FROM dims JOIN cent USING (d) GROUP BY 1),
      s1 AS MATERIALIZED (
        SELECT r.id, round(r.dot / (norms.n * (SELECT cn FROM cnorm)), 12) AS rel,
               0.0 AS ms
        FROM rel0 r JOIN norms ON r.id = norms.id),
      p1 AS MATERIALIZED (
        SELECT id, round(0.75 * rel - 0.25 * ms, 12) AS sc
        FROM s1 ORDER BY sc DESC, id LIMIT 1),
      ${(2 to 6).map(round).mkString("")}
      sel AS (
        SELECT 1 AS rank, id, sc FROM p1
        ${(2 to 6).map(r => s"UNION ALL SELECT $r, id, sc FROM p$r").mkString("\n        ")})
      SELECT CAST(rank AS BIGINT) AS rank, id AS vec_id, sc AS mmr_score
      FROM sel ORDER BY rank
      """.trim
    })

  /** Exact kNN-Shapley data valuation ([[Valuation.knnShapley]],
    * K = 5): every 25th embedding is the held-out panel, the rest is
    * the corpus being valued — per training row, its exact Shapley
    * value under the kNN utility (negative = hurts the panel:
    * mislabel/poison candidates; the drop list for curation). The
    * oracle replays the closed form: exact decimal squared-euclidean
    * distances, per-panel ranking, the telescoped per-rank term, and
    * a decimal suffix-frame window sum — bit-for-bit.
    */
  val q384KnnShapley = HarnessQuery(
    "q384_knn_shapley",
    (spark, dir) => {
      val em = Tables.embeddings(spark, dir)
      Valuation.knnShapley(
        em.where(col("vec_id") % 25 =!= 0),
        em.where(col("vec_id") % 25 === 0),
        "vec_id", "embedding", "label", k = 5)
        .orderBy(col("vec_id"))
    },
    Some("""
      WITH te AS (
        SELECT vec_id AS tid, embedding AS e, label AS ty
        FROM embeddings WHERE vec_id % 25 = 0),
      tr AS (
        SELECT vec_id AS rid, embedding AS e, label AS ry
        FROM embeddings WHERE vec_id % 25 <> 0),
      d AS (
        SELECT te.tid, tr.rid, any_value(te.ty) AS ty, any_value(tr.ry) AS ry,
               CAST(sum(CAST(
                 (CAST(te.e[g.i] AS DOUBLE) - CAST(tr.e[g.i] AS DOUBLE))
                 * (CAST(te.e[g.i] AS DOUBLE) - CAST(tr.e[g.i] AS DOUBLE))
                 AS DECIMAL(30,18))) AS DOUBLE) AS dist
        FROM te, tr, generate_series(1, 64) g(i)
        GROUP BY 1, 2),
      r AS (
        SELECT tid, rid,
               CASE WHEN ry = ty THEN 1 ELSE 0 END AS ind,
               row_number() OVER (PARTITION BY tid ORDER BY dist, rid) AS j,
               count(*) OVER (PARTITION BY tid) AS n
        FROM d),
      c AS (
        SELECT tid, rid, j,
               CASE WHEN j = n THEN CAST(ind AS DOUBLE) / n
                    ELSE (ind - lead(ind) OVER (PARTITION BY tid ORDER BY j))
                         / CAST(5 AS DOUBLE) * least(5, j) / j
               END AS cl
        FROM r),
      s AS (
        SELECT tid, rid,
               CAST(sum(CAST(cl AS DECIMAL(30,18)))
                 OVER (PARTITION BY tid ORDER BY j
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                 AS DOUBLE) AS sv
        FROM c)
      SELECT rid AS vec_id,
             round(CAST(sum(CAST(sv AS DECIMAL(30,18))) AS DOUBLE)
               / count(*), 12) AS shapley
      FROM s GROUP BY 1 ORDER BY 1
    """.trim))

  /** Margin-based bitext mining ([[Similarity.bitextMarginMine]],
    * k = 4, threshold 1.02): two disjoint embedding slices stand in
    * for source/target corpora; output is the mutual-best pairs whose
    * cosine beats both rows' neighborhood density by >= 2%. The oracle
    * replays the full pipeline — brute all-pair decimal cosines,
    * forward/backward top-4, decimal neighborhood means, margin, and
    * the two mutual-best rank windows.
    */
  val q385BitextMargin = HarnessQuery(
    "q385_bitext_margin",
    (spark, dir) => {
      // deciles, not quintiles: this query pins the BRUTE |L|x|R|
      // arity as the exactness witness, so its input is a quarter of
      // q398's — the candidate-parameterized (100 TB) arity benches
      // at the larger slice in q398_bitext_candidates
      val em = Tables.embeddings(spark, dir)
      Similarity.bitextMarginMine(
        em.where(col("vec_id") % 10 === 0),
        em.where(col("vec_id") % 10 === 3),
        "vec_id", "embedding", k = 4, threshold = 1.02)
        .withColumn("cosine", floor(col("cosine") * 1e9) / 1e9)
        .orderBy(col("left_id"))
    },
    Some("""
      WITH l AS (
        SELECT vec_id AS id, embedding AS e FROM embeddings
        WHERE vec_id % 10 = 0),
      r AS (
        SELECT vec_id AS id, embedding AS e FROM embeddings
        WHERE vec_id % 10 = 3),
      nl AS (
        SELECT id, e,
               sqrt(CAST(sum(CAST(CAST(e[g.i] AS DOUBLE)
                 * CAST(e[g.i] AS DOUBLE) AS DECIMAL(30,18))) AS DOUBLE))
                 AS nrm
        FROM l, generate_series(1, 64) g(i) GROUP BY 1, 2),
      nr AS (
        SELECT id, e,
               sqrt(CAST(sum(CAST(CAST(e[g.i] AS DOUBLE)
                 * CAST(e[g.i] AS DOUBLE) AS DECIMAL(30,18))) AS DOUBLE))
                 AS nrm
        FROM r, generate_series(1, 64) g(i) GROUP BY 1, 2),
      cosall AS MATERIALIZED (
        SELECT a.id AS lid, b.id AS rid,
               CAST(sum(CAST(CAST(a.e[g.i] AS DOUBLE)
                 * CAST(b.e[g.i] AS DOUBLE) AS DECIMAL(30,18))) AS DOUBLE)
                 / (any_value(a.nrm) * any_value(b.nrm)) AS cosine
        FROM nl a, nr b, generate_series(1, 64) g(i)
        GROUP BY 1, 2),
      fwd AS MATERIALIZED (
        SELECT lid, rid, cosine FROM (
          SELECT lid, rid, cosine,
                 row_number() OVER (PARTITION BY lid
                   ORDER BY cosine DESC, rid) AS rk
          FROM cosall) WHERE rk <= 4),
      bwd AS MATERIALIZED (
        SELECT lid, rid, cosine FROM (
          SELECT lid, rid, cosine,
                 row_number() OVER (PARTITION BY rid
                   ORDER BY cosine DESC, lid) AS rk
          FROM cosall) WHERE rk <= 4),
      avgl AS (
        SELECT lid, CAST(sum(CAST(cosine AS DECIMAL(30,18))) AS DOUBLE)
                 / count(*) AS avg_l
        FROM fwd GROUP BY 1),
      avgr AS (
        SELECT rid, CAST(sum(CAST(cosine AS DECIMAL(30,18))) AS DOUBLE)
                 / count(*) AS avg_r
        FROM bwd GROUP BY 1),
      cand AS (
        SELECT lid, rid, max(cosine) AS cosine FROM (
          SELECT * FROM fwd UNION ALL SELECT * FROM bwd)
        GROUP BY 1, 2),
      scored AS (
        SELECT c.lid, c.rid, c.cosine,
               c.cosine / ((a.avg_l + b.avg_r) / 2.0) AS margin
        FROM cand c JOIN avgl a USING (lid) JOIN avgr b USING (rid)),
      ranked AS (
        SELECT lid, rid, cosine, margin,
               row_number() OVER (PARTITION BY lid
                 ORDER BY margin DESC, rid) AS rl,
               row_number() OVER (PARTITION BY rid
                 ORDER BY margin DESC, lid) AS rr
        FROM scored)
      SELECT lid AS left_id, rid AS right_id,
             floor(cosine * 1e9) / 1e9 AS cosine,
             round(margin, 12) AS margin
      FROM ranked
      WHERE rl = 1 AND rr = 1 AND margin >= 1.02
      ORDER BY left_id
    """.trim))

  /** Candidate-parameterized margin mining ([[Similarity
    * .bitextMarginMine]] fed by [[Similarity.lshCandidatePairs]],
    * numBits = 8, bands = 4, k = 4, threshold 1.0) — the 100 TB arity
    * of q385: the pair table is LSH band collisions, never |L|x|R|,
    * and forward/backward top-k + neighborhood means run within the
    * candidate set (the CCMatrix truncation). The oracle replays the
    * md5-derived hyperplanes, sign sketches, band collisions, and the
    * full margin pipeline over exactly those candidates.
    */
  val q398BitextCandidates = HarnessQuery(
    "q398_bitext_candidates",
    (spark, dir) => {
      val em = Tables.embeddings(spark, dir)
      val l = em.where(col("vec_id") % 5 === 0)
      val r = em.where(col("vec_id") % 5 === 3)
      Similarity.bitextMarginMine(
        l, r, "vec_id", "embedding", k = 4, threshold = 1.0,
        Similarity.lshCandidatePairs(l, r, "vec_id", "embedding",
          numBits = 8, bands = 4))
        .withColumn("cosine", floor(col("cosine") * 1e9) / 1e9)
        .orderBy(col("left_id"))
    },
    Some("""
      WITH hp AS (
        SELECT h.h AS h, d.d AS d,
               (CAST(('0x' || substr(md5('42_' || h.h || '_' || d.d), 1, 15)) AS BIGINT)
                 % 1000000) / 1000000.0 - 0.5 AS v
        FROM generate_series(0, 7) h(h), generate_series(0, 63) d(d)),
      side AS (
        SELECT vec_id, embedding, vec_id % 5 AS m FROM embeddings
        WHERE vec_id % 5 IN (0, 3)),
      dots AS (
        SELECT e.vec_id, hp.h,
               CAST(sum(CAST(CAST(e.embedding[hp.d + 1] AS DOUBLE) * hp.v
                 AS DECIMAL(30,18))) AS DOUBLE) AS dv
        FROM side e, hp GROUP BY 1, 2),
      sk AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN dv > 0 THEN (CAST(1 AS BIGINT) << (7 - h))
                 ELSE 0 END) AS BIGINT) AS sk
        FROM dots GROUP BY 1),
      bands AS (
        SELECT s.vec_id, b.b || '_' || ((s.sk >> (b.b * 2)) & 3) AS band_key
        FROM sk s, generate_series(0, 3) b(b)),
      cand0 AS (
        SELECT DISTINCT lb.vec_id AS lid, rb.vec_id AS rid
        FROM bands lb JOIN bands rb USING (band_key)
        WHERE lb.vec_id % 5 = 0 AND rb.vec_id % 5 = 3),
      nl AS MATERIALIZED (
        SELECT vec_id AS id, embedding AS e,
               sqrt(CAST(sum(CAST(CAST(embedding[g.i] AS DOUBLE)
                 * CAST(embedding[g.i] AS DOUBLE) AS DECIMAL(30,18)))
                 AS DOUBLE)) AS nrm
        FROM side, generate_series(1, 64) g(i)
        WHERE m = 0 GROUP BY 1, 2),
      nr AS MATERIALIZED (
        SELECT vec_id AS id, embedding AS e,
               sqrt(CAST(sum(CAST(CAST(embedding[g.i] AS DOUBLE)
                 * CAST(embedding[g.i] AS DOUBLE) AS DECIMAL(30,18)))
                 AS DOUBLE)) AS nrm
        FROM side, generate_series(1, 64) g(i)
        WHERE m = 3 GROUP BY 1, 2),
      cosall AS MATERIALIZED (
        SELECT c0.lid, c0.rid,
               CAST(sum(CAST(CAST(a.e[g.i] AS DOUBLE)
                 * CAST(b.e[g.i] AS DOUBLE) AS DECIMAL(30,18))) AS DOUBLE)
                 / (any_value(a.nrm) * any_value(b.nrm)) AS cosine
        FROM cand0 c0
        JOIN nl a ON a.id = c0.lid
        JOIN nr b ON b.id = c0.rid,
        generate_series(1, 64) g(i)
        GROUP BY 1, 2),
      fwd AS MATERIALIZED (
        SELECT lid, rid, cosine FROM (
          SELECT lid, rid, cosine,
                 row_number() OVER (PARTITION BY lid
                   ORDER BY cosine DESC, rid) AS rk
          FROM cosall) WHERE rk <= 4),
      bwd AS MATERIALIZED (
        SELECT lid, rid, cosine FROM (
          SELECT lid, rid, cosine,
                 row_number() OVER (PARTITION BY rid
                   ORDER BY cosine DESC, lid) AS rk
          FROM cosall) WHERE rk <= 4),
      avgl AS (
        SELECT lid, CAST(sum(CAST(cosine AS DECIMAL(30,18))) AS DOUBLE)
                 / count(*) AS avg_l
        FROM fwd GROUP BY 1),
      avgr AS (
        SELECT rid, CAST(sum(CAST(cosine AS DECIMAL(30,18))) AS DOUBLE)
                 / count(*) AS avg_r
        FROM bwd GROUP BY 1),
      cand AS (
        SELECT lid, rid, max(cosine) AS cosine FROM (
          SELECT * FROM fwd UNION ALL SELECT * FROM bwd)
        GROUP BY 1, 2),
      scored AS (
        SELECT c.lid, c.rid, c.cosine,
               c.cosine / ((a.avg_l + b.avg_r) / 2.0) AS margin
        FROM cand c JOIN avgl a USING (lid) JOIN avgr b USING (rid)),
      ranked AS (
        SELECT lid, rid, cosine, margin,
               row_number() OVER (PARTITION BY lid
                 ORDER BY margin DESC, rid) AS rl,
               row_number() OVER (PARTITION BY rid
                 ORDER BY margin DESC, lid) AS rr
        FROM scored)
      SELECT lid AS left_id, rid AS right_id,
             floor(cosine * 1e9) / 1e9 AS cosine,
             round(margin, 12) AS margin
      FROM ranked
      WHERE rl = 1 AND rr = 1 AND margin >= 1.0
      ORDER BY left_id
    """.trim))

  /** Candidate-parameterized kNN-Shapley ([[Valuation.knnShapley]]
    * fed by [[Similarity.lshCandidatePairs]], numBits = 8, bands = 4,
    * K = 5) — the truncated estimator of q384 at corpus scale: each
    * panel point ranks only its LSH band collisions, so no window
    * partition ever sees the whole corpus. The oracle replays the
    * hyperplanes, band collisions, and the closed-form suffix sum
    * over exactly the candidate ranking.
    */
  val q399ShapleyCandidates = HarnessQuery(
    "q399_shapley_candidates",
    (spark, dir) => {
      val em = Tables.embeddings(spark, dir)
      val tr = em.where(col("vec_id") % 25 =!= 0)
      val te = em.where(col("vec_id") % 25 === 0)
      Valuation.knnShapley(
        tr, te, "vec_id", "embedding", "label", k = 5,
        Similarity.lshCandidatePairs(tr, te, "vec_id", "embedding",
          numBits = 8, bands = 4)
          .select(col("left_id").as("train_id"),
            col("right_id").as("test_id")))
        .orderBy(col("vec_id"))
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
        SELECT DISTINCT tb.vec_id AS rid, pb.vec_id AS tid
        FROM bands tb JOIN bands pb USING (band_key)
        WHERE tb.vec_id % 25 <> 0 AND pb.vec_id % 25 = 0),
      te AS (
        SELECT vec_id AS tid, embedding AS e, label AS ty
        FROM embeddings WHERE vec_id % 25 = 0),
      tr AS (
        SELECT vec_id AS rid, embedding AS e, label AS ry
        FROM embeddings WHERE vec_id % 25 <> 0),
      d AS (
        SELECT c.tid, c.rid, any_value(te.ty) AS ty, any_value(tr.ry) AS ry,
               CAST(sum(CAST(
                 (CAST(te.e[g.i] AS DOUBLE) - CAST(tr.e[g.i] AS DOUBLE))
                 * (CAST(te.e[g.i] AS DOUBLE) - CAST(tr.e[g.i] AS DOUBLE))
                 AS DECIMAL(30,18))) AS DOUBLE) AS dist
        FROM cand c
        JOIN te ON te.tid = c.tid
        JOIN tr ON tr.rid = c.rid,
        generate_series(1, 64) g(i)
        GROUP BY 1, 2),
      r AS (
        SELECT tid, rid,
               CASE WHEN ry = ty THEN 1 ELSE 0 END AS ind,
               row_number() OVER (PARTITION BY tid ORDER BY dist, rid) AS j,
               count(*) OVER (PARTITION BY tid) AS n
        FROM d),
      c AS (
        SELECT tid, rid, j,
               CASE WHEN j = n THEN CAST(ind AS DOUBLE) / n
                    ELSE (ind - lead(ind) OVER (PARTITION BY tid ORDER BY j))
                         / CAST(5 AS DOUBLE) * least(5, j) / j
               END AS cl
        FROM r),
      s AS (
        SELECT tid, rid,
               CAST(sum(CAST(cl AS DECIMAL(30,18)))
                 OVER (PARTITION BY tid ORDER BY j
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                 AS DOUBLE) AS sv
        FROM c)
      SELECT rid AS vec_id,
             round(CAST(sum(CAST(sv AS DECIMAL(30,18))) AS DOUBLE)
               / count(*), 12) AS shapley
      FROM s GROUP BY 1 ORDER BY 1
    """.trim))

  def all: Seq[HarnessQuery] = Seq(
    q366Mmr, q384KnnShapley, q385BitextMargin,
    q398BitextCandidates, q399ShapleyCandidates,
    q340KmeansFit, q341KmeansCells, q342KmeansIvf, q344Skipgram, q346KCenter,
    q358Pca2, q359PcaOutliers, q360CentroidDrift,
    q211CollocPmi, q212TokenEntropy, q213GramMatrix, q214CovMatrix,
    q215WalkForward, q216LabelProp, q217PowerIteration, q218LatenessAudit,
    q219MergeableMoments, q220Diversity, q221QuantileNorm, q222Scd2,
    q223MannWhitney, q224Spearman, q225DpCounts, q228OovRate, q230Conformal,
    q231AsofForward, q232NovelActions, q234SvmlightExport, q235TheilSen,
    q237KsBySource, q238GapStats, q239TokenCountExpr, q240HashEmbedding,
    q241TrimmedMean, q247WeightedSample, q253HeavyTokens, q256Rrf)

  /** Reciprocal-rank fusion of a length ranker and a seeded-hash
    * explorer ranker ([[graft.operators.Fusion.rrfFuse]], k = 60,
    * top-40 lists fused to top-20): round-12 reciprocal terms
    * accumulate in decimal, so fused scores and ranks replay exactly.
    */
  val q256Rrf = HarnessQuery(
    "q256_rrf",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(spark, dir)
      val byLen = docs.select(lit(0).as("q"), col("doc_id"),
        lit("len").as("ranker"),
        row_number().over(
          Window.orderBy(col("n_chars").desc, col("doc_id")))
          .cast("long").as("rnk"))
        .where(col("rnk") <= 40)
      val byHash = docs.select(lit(0).as("q"), col("doc_id"),
        lit("hash").as("ranker"),
        row_number().over(Window.orderBy(
          graft.functions.TextFunctions.md5Hash60(
            concat(col("doc_id").cast("string"), lit(":42"))),
          col("doc_id")))
          .cast("long").as("rnk"))
        .where(col("rnk") <= 40)
      graft.operators.Fusion.rrfFuse(
        byLen.unionByName(byHash), "q", "doc_id", "ranker", "rnk",
        k = 60, topN = 20)
        .select(col("doc_id"), col("n_rankers"),
          col("rrf_score"), col("fused_rank"))
        .orderBy(col("fused_rank"))
    },
    Some("""
      WITH a AS (
        SELECT 0 AS q, doc_id, 'len' AS ranker,
               CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
                 AS BIGINT) AS rnk
        FROM documents QUALIFY rnk <= 40),
      b AS (
        SELECT 0 AS q, doc_id, 'hash' AS ranker,
               CAST(row_number() OVER (ORDER BY
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'),
                   1, 15)) AS BIGINT), doc_id) AS BIGINT) AS rnk
        FROM documents QUALIFY rnk <= 40),
      u AS (SELECT * FROM a UNION ALL SELECT * FROM b),
      f AS (
        SELECT q, doc_id, CAST(count(ranker) AS BIGINT) AS n_rankers,
               sum(CAST(round(1.0 / (60 + rnk), 12) AS DECIMAL(38,12)))
                 AS score
        FROM u GROUP BY 1, 2)
      SELECT doc_id, n_rankers, CAST(score AS DOUBLE) AS rrf_score,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id)
               AS BIGINT) AS fused_rank
      FROM f QUALIFY fused_rank <= 20 ORDER BY fused_rank
    """.trim))

  /** Heavy-hitter vocabulary tokens
    * ([[graft.operators.HeavyHitters.heavyHitters]], minFraction
    * 0.004): per-partition Misra–Gries proposes, the exact
    * candidate-only count decides — so the output is exact and the
    * oracle is a plain frequency filter, sketch-free.
    */
  val q253HeavyTokens = HarnessQuery(
    "q253_heavy_tokens",
    (spark, dir) =>
      graft.operators.HeavyHitters.heavyHitters(
        Tables.documents(spark, dir)
          .select(explode(graft.functions.TextFunctions
            .tokens(col("text"))).as("token")),
        "token", minFraction = 0.004),
    Some("""
      WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
          AS token
        FROM documents),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
      c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
            FROM toks GROUP BY 1)
      SELECT token, cnt,
             round(CAST(cnt AS DOUBLE)
               / CAST((SELECT n FROM tot) AS DOUBLE), 12) AS freq
      FROM c
      WHERE CAST(cnt AS DOUBLE) > 0.004 * (SELECT n FROM tot)
      ORDER BY cnt DESC, token
    """.trim))
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{EventAnalytics, Experiment, Geo, TimeSeries, Topics}
import graft.sources.Tables

/** Round-7 model-estimation queries: LDA-style topic EM, gap-filled
  * interpolation, geospatial nearest, propensity matching, and an HMM
  * forward pass — each a fixed-parameter *estimation step* expressed as
  * dataflow and replayed exactly in the DuckDB oracle (recursive CTE
  * for the sequential HMM; unrolled CTE chains for the EM step).
  */
object ModelQueries {

  /** Shared CTE prefix of the two LDA queries: token counts ->
    * hash-seeded phi0/theta0 -> snapped responsibilities (`nr`).
    * Mirrors [[Topics.eStep]] operation-for-operation (floor-snaps
    * before every order-sensitive aggregation).
    */
  private val ldaCtes = """
      WITH tc AS (
        SELECT doc_id, t.term AS w, count(*) AS n FROM (
          SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)),
            '\s+')) AS term
          FROM documents) t GROUP BY 1, 2),
      vocab AS (SELECT DISTINCT w FROM tc),
      topics AS (SELECT t AS topic FROM generate_series(0, 3) g(t)),
      phiraw AS (
        SELECT topic, w,
               0.5 + (CAST(('0x' || substr(md5('phi_' || topic || '_' || w),
                 1, 15)) AS BIGINT)) / 1152921504606846976.0 AS raw
        FROM vocab, topics),
      phid AS (
        SELECT topic, CAST(sum(CAST(raw AS DECIMAL(30,12))) AS DOUBLE)
          AS pden
        FROM phiraw GROUP BY 1),
      phi0 AS (
        SELECT p.topic, p.w, p.raw / d.pden AS phi
        FROM phiraw p JOIN phid d USING (topic)),
      thraw AS (
        SELECT doc_id, topic,
               0.5 + (CAST(('0x' || substr(md5('theta_' || doc_id || '_' ||
                 topic), 1, 15)) AS BIGINT)) / 1152921504606846976.0 AS raw
        FROM (SELECT DISTINCT doc_id FROM documents), topics),
      thd AS (
        SELECT doc_id, CAST(sum(CAST(raw AS DECIMAL(30,12))) AS DOUBLE)
          AS tden
        FROM thraw GROUP BY 1),
      th0 AS (
        SELECT t.doc_id, t.topic, t.raw / d.tden AS theta
        FROM thraw t JOIN thd d USING (doc_id)),
      joint AS (
        SELECT tc.doc_id, tc.w, p.topic, tc.n,
               floor(t.theta * p.phi * 1e14) / 1e14 AS j
        FROM tc JOIN phi0 p ON p.w = tc.w
                JOIN th0 t ON t.doc_id = tc.doc_id AND t.topic = p.topic),
      den AS (
        SELECT doc_id, w, CAST(sum(CAST(j AS DECIMAL(30,14))) AS DOUBLE)
          AS den
        FROM joint GROUP BY 1, 2),
      nr AS (
        SELECT joint.doc_id, joint.topic, joint.w, joint.n,
               floor(joint.n * (joint.j / den.den) * 1e12) / 1e12 AS nr
        FROM joint JOIN den ON den.doc_id = joint.doc_id
          AND den.w = joint.w)"""

  /** One LDA EM step, theta side ([[Topics.ldaEmStep]], k = 4):
    * per-document topic weights after a single E+M round from
    * hash-seeded initials. 4 rows per document; weights sum to 1.
    */
  val q300LdaEstep = HarnessQuery(
    "q300_lda_estep",
    (spark, dir) =>
      Topics.ldaEmStep(Tables.documents(spark, dir), "text", "doc_id", k = 4)
        .select(col("doc_id"), col("topic"),
          (floor(col("theta") * 1e10) / 1e10).as("theta"))
        .orderBy(col("doc_id"), col("topic")),
    Some((ldaCtes + """,
      nd AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS nd FROM tc GROUP BY 1),
      num AS (
        SELECT doc_id, topic, sum(CAST(nr AS DECIMAL(30,12))) AS num
        FROM nr GROUP BY 1, 2)
      SELECT num.doc_id, CAST(num.topic AS INT) AS topic,
             floor(CAST(num.num AS DOUBLE) / nd.nd * 1e10) / 1e10 AS theta
      FROM num JOIN nd USING (doc_id) ORDER BY doc_id, topic
    """).trim))

  /** The phi side of the same M step ([[Topics.ldaTopWords]]): top-10
    * re-estimated words per topic.
    */
  val q305LdaTopWords = HarnessQuery(
    "q305_lda_top_words",
    (spark, dir) =>
      Topics.ldaTopWords(Tables.documents(spark, dir), "text", "doc_id",
        k = 4, top = 10)
        .select(col("topic"), col("rank"), col("w"),
          (floor(col("phi") * 1e10) / 1e10).as("phi"))
        .orderBy(col("topic"), col("rank")),
    Some((ldaCtes + """,
      num AS (
        SELECT topic, w, sum(CAST(nr AS DECIMAL(30,12))) AS num
        FROM nr GROUP BY 1, 2),
      tden AS (
        SELECT topic, CAST(sum(num) AS DOUBLE) AS td FROM num GROUP BY 1),
      ranked AS (
        SELECT num.topic, num.w, CAST(num.num AS DOUBLE) / tden.td AS phi,
               row_number() OVER (PARTITION BY num.topic
                 ORDER BY CAST(num.num AS DOUBLE) / tden.td DESC, num.w)
                 AS rank
        FROM num JOIN tden USING (topic))
      SELECT CAST(topic AS INT) AS topic, CAST(rank AS INT) AS rank, w,
             floor(phi * 1e10) / 1e10 AS phi
      FROM ranked WHERE rank <= 10 ORDER BY topic, rank
    """).trim))

  /** Gap-filled daily interpolation ([[TimeSeries.interpolateDaily]]):
    * a sparse event subset (event_id % 97 = 0) leaves missing days per
    * event type; the dense grid linearly interpolates them. Integer day
    * weights, exact decimal day-sums.
    */
  val q301Interpolate = HarnessQuery(
    "q301_interpolate",
    (spark, dir) =>
      TimeSeries.interpolateDaily(
        Tables.events(spark, dir).filter(pmod(col("event_id"), lit(97L)) === 0),
        "event_type", "ts", "value")
        .select(col("event_type"), col("day"),
          (floor(col("value") * 1e8) / 1e8).as("value"),
          col("interpolated"))
        .orderBy(col("event_type"), col("day")),
    Some("""
      WITH daily AS (
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
               CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS v
        FROM events WHERE event_id % 97 = 0 GROUP BY 1, 2),
      grid AS (
        SELECT event_type, unnest(generate_series(mn, mx)) AS day
        FROM (SELECT event_type, min(day) AS mn, max(day) AS mx
              FROM daily GROUP BY 1)),
      sparse AS (
        SELECT g.event_type, g.day, d.v
        FROM grid g LEFT JOIN daily d USING (event_type, day)),
      win AS (
        SELECT event_type, day, v,
          last_value(v IGNORE NULLS) OVER
            (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
          last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
            (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
          first_value(v IGNORE NULLS) OVER
            (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
          first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
            (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        FROM sparse)
      SELECT event_type, day,
             floor((CASE WHEN v IS NOT NULL THEN v
               ELSE pv + (nv - pv) * (CAST(day - pd AS DOUBLE)
                 / CAST(nd - pd AS DOUBLE)) END) * 1e8) / 1e8 AS value,
             v IS NULL AS interpolated
      FROM win ORDER BY event_type, day
    """.trim))

  /** Nearest-site assignment ([[Geo.nearestSite]]): grid-derived
    * lat/lon for a point sample and 25 nation sites; per-site point
    * count and distance envelope. The oracle writes radians as
    * x / 180 * pi() to match Java's Math.toRadians operation order.
    */
  val q302GeoNearest = HarnessQuery(
    "q302_geo_nearest",
    (spark, dir) => {
      val pts = Tables.events(spark, dir)
        .filter(pmod(col("event_id"), lit(11L)) === 0)
        .select(col("event_id"),
          (pmod(col("user_id") * 7, lit(1700L)).cast("double") / 10.0 - 85.0)
            .as("lat"),
          (pmod(col("event_id") * 13, lit(3600L)).cast("double") / 10.0
            - 180.0).as("lon"))
      val sites = Tables.nation(spark, dir)
        .select(col("n_nationkey").as("site_id"),
          (pmod(col("n_nationkey") * 31, lit(1700)).cast("double") / 10.0
            - 85.0).as("slat"),
          (pmod(col("n_nationkey") * 53, lit(3600)).cast("double") / 10.0
            - 180.0).as("slon"))
      Geo.nearestSite(pts, Seq("event_id"), "lat", "lon",
          sites, "site_id", "slat", "slon")
        .groupBy(col("site_id"))
        .agg(count(lit(1)).as("n_points"),
          (floor(min(col("distance_km")) * 1e6) / 1e6).as("min_km"),
          (floor(max(col("distance_km")) * 1e6) / 1e6).as("max_km"))
        .orderBy(col("site_id"))
    },
    Some("""
      WITH pts AS (
        SELECT event_id,
               CAST((user_id * 7) % 1700 AS DOUBLE) / 10.0 - 85.0 AS lat,
               CAST((event_id * 13) % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon
        FROM events WHERE event_id % 11 = 0),
      sites AS (
        SELECT n_nationkey AS site_id,
               CAST((n_nationkey * 31) % 1700 AS DOUBLE) / 10.0 - 85.0
                 AS slat,
               CAST((n_nationkey * 53) % 3600 AS DOUBLE) / 10.0 - 180.0
                 AS slon
        FROM nation),
      d AS (
        SELECT p.event_id, s.site_id,
               2.0 * 6371.0088 * asin(sqrt(
                 sin((s.slat - p.lat) / 180.0 * pi() / 2)
                   * sin((s.slat - p.lat) / 180.0 * pi() / 2)
                 + cos(p.lat / 180.0 * pi()) * cos(s.slat / 180.0 * pi())
                   * sin((s.slon - p.lon) / 180.0 * pi() / 2)
                   * sin((s.slon - p.lon) / 180.0 * pi() / 2))) AS dist
        FROM pts p, sites s),
      best AS (
        SELECT * FROM (
          SELECT d.*, row_number() OVER
            (PARTITION BY event_id ORDER BY dist, site_id) AS rk
          FROM d) WHERE rk = 1)
      SELECT site_id, count(*) AS n_points,
             floor(min(dist) * 1e6) / 1e6 AS min_km,
             floor(max(dist) * 1e6) / 1e6 AS max_km
      FROM best GROUP BY 1 ORDER BY site_id
    """.trim))

  /** Propensity-score matching ATT ([[Experiment.psmAtt]]): purchases
    * as treated, views as controls, an md5-uniform score, caliper
    * 0.001 — nearest-control-with-replacement matching on integer
    * micro-unit scores.
    */
  val q303PsmAtt = HarnessQuery(
    "q303_psm_att",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .filter(col("event_type").isin("purchase", "view"))
        .withColumn("score",
          TextFunctions.md5Hash60(concat(lit("ps_"), col("event_id")))
            .cast("double") / lit(1152921504606846976.0))
      Experiment.psmAtt(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "view"),
        "score", "value", "event_id", caliper = 0.001)
    },
    Some("""
      WITH ev AS (
        SELECT event_id, event_type, value,
               (CAST(('0x' || substr(md5('ps_' || event_id), 1, 15))
                 AS BIGINT)) / 1152921504606846976.0 AS score
        FROM events WHERE event_type IN ('purchase', 'view')),
      t AS (
        SELECT event_id AS tid, CAST(floor(score * 1e6) AS BIGINT) AS ts_,
               value AS ty
        FROM ev WHERE event_type = 'purchase'),
      c AS (
        SELECT event_id AS cid, CAST(floor(score * 1e6) AS BIGINT) AS cs,
               value AS cy
        FROM ev WHERE event_type = 'view'),
      m AS (
        SELECT t.tid, t.ts_, t.ty, c.cid, c.cs, c.cy,
               row_number() OVER (PARTITION BY t.tid
                 ORDER BY abs(t.ts_ - c.cs),
                   CASE WHEN c.cs <= t.ts_ THEN 0 ELSE 1 END, c.cid) AS rk
        FROM t LEFT JOIN c ON abs(t.ts_ - c.cs) <= 1000),
      best AS (SELECT * FROM m WHERE rk = 1 OR rk IS NULL)
      SELECT count(*) AS n_treated,
             count(cid) AS n_matched,
             floor(CAST(CAST(sum(CASE WHEN cid IS NOT NULL
                 THEN CAST(ty AS DECIMAL(30,6)) END) AS DECIMAL(30,6))
               - CAST(sum(CAST(cy AS DECIMAL(30,6))) AS DECIMAL(30,6))
               AS DOUBLE) / count(cid) * 1e8) / 1e8 AS att,
             floor(CAST(sum(abs(ts_ - cs)) AS DOUBLE) / count(cid) * 1e2)
               / 1e2 / 1e6 AS mean_abs_gap
      FROM best
    """.trim))

  /** Two-state HMM scaled forward pass ([[EventAnalytics.hmmForward]])
    * over each user's event-type sequence — the oracle replays the
    * sequential recursion with a recursive CTE (one row per (user,
    * position), joined forward step by step).
    */
  val q304HmmForward = HarnessQuery(
    "q304_hmm_forward",
    (spark, dir) =>
      EventAnalytics.hmmForward(
        Tables.events(spark, dir), "user_id", "ts", "event_id", "event_type",
        Seq("click" -> (0.3, 0.15), "view" -> (0.4, 0.1),
          "signup" -> (0.1, 0.15), "purchase" -> (0.05, 0.5),
          "error" -> (0.15, 0.1)))
        .select(col("user_id"), col("n_events"),
          (floor(col("log_likelihood") * 1e6) / 1e6).as("log_likelihood"),
          (floor(col("p_state0") * 1e8) / 1e8).as("p_state0"))
        .orderBy(col("user_id")),
    Some("""
      WITH RECURSIVE seq AS (
        SELECT user_id,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS pos,
               CASE event_type WHEN 'click' THEN 0.3::DOUBLE
                 WHEN 'view' THEN 0.4::DOUBLE WHEN 'signup' THEN 0.1::DOUBLE
                 WHEN 'purchase' THEN 0.05::DOUBLE
                 WHEN 'error' THEN 0.15::DOUBLE ELSE 0.2::DOUBLE END AS e0,
               CASE event_type WHEN 'click' THEN 0.15::DOUBLE
                 WHEN 'view' THEN 0.1::DOUBLE WHEN 'signup' THEN 0.15::DOUBLE
                 WHEN 'purchase' THEN 0.5::DOUBLE
                 WHEN 'error' THEN 0.1::DOUBLE ELSE 0.2::DOUBLE END AS e1
        FROM events),
      lens AS (SELECT user_id, max(pos) AS n FROM seq GROUP BY 1),
      f AS (
        SELECT user_id, pos,
          ((0.6 * 0.85 + 0.4 * 0.25) * e0)
            / ((0.6 * 0.85 + 0.4 * 0.25) * e0
               + (0.6 * 0.15 + 0.4 * 0.75) * e1) AS a0,
          ((0.6 * 0.15 + 0.4 * 0.75) * e1)
            / ((0.6 * 0.85 + 0.4 * 0.25) * e0
               + (0.6 * 0.15 + 0.4 * 0.75) * e1) AS a1,
          0.0 + ln((0.6 * 0.85 + 0.4 * 0.25) * e0
               + (0.6 * 0.15 + 0.4 * 0.75) * e1) AS ll
        FROM seq WHERE pos = 1
        UNION ALL
        SELECT s.user_id, s.pos,
          ((f.a0 * 0.85 + f.a1 * 0.25) * s.e0)
            / ((f.a0 * 0.85 + f.a1 * 0.25) * s.e0
               + (f.a0 * 0.15 + f.a1 * 0.75) * s.e1),
          ((f.a0 * 0.15 + f.a1 * 0.75) * s.e1)
            / ((f.a0 * 0.85 + f.a1 * 0.25) * s.e0
               + (f.a0 * 0.15 + f.a1 * 0.75) * s.e1),
          f.ll + ln((f.a0 * 0.85 + f.a1 * 0.25) * s.e0
               + (f.a0 * 0.15 + f.a1 * 0.75) * s.e1)
        FROM f JOIN seq s ON s.user_id = f.user_id AND s.pos = f.pos + 1)
      SELECT f.user_id, CAST(l.n AS BIGINT) AS n_events,
             floor(f.ll * 1e6) / 1e6 AS log_likelihood,
             floor(f.a0 * 1e8) / 1e8 AS p_state0
      FROM f JOIN lens l ON l.user_id = f.user_id AND f.pos = l.n
      ORDER BY f.user_id
    """.trim))

  /** Shortest-roundtrip double literal for the oracle: 17 significant
    * digits parse back to the identical IEEE double in DuckDB; ::DOUBLE
    * stops the literal defaulting to DECIMAL.
    */
  private def dlit(x: Double): String = s"($x::DOUBLE)"

  /** Viterbi best-path score ([[EventAnalytics.hmmViterbiScore]]) of
    * q304's HMM: log-space with pre-logged constants, so every step is
    * additions + greatest — bit-exact across engines. The oracle embeds
    * the SAME 17-digit log literals this object computed in Scala.
    */
  val q306HmmViterbi = HarnessQuery(
    "q306_hmm_viterbi",
    (spark, dir) =>
      EventAnalytics.hmmViterbiScore(
        Tables.events(spark, dir), "user_id", "ts", "event_id", "event_type",
        Seq("click" -> (0.3, 0.15), "view" -> (0.4, 0.1),
          "signup" -> (0.1, 0.15), "purchase" -> (0.05, 0.5),
          "error" -> (0.15, 0.1)))
        .select(col("user_id"), col("n_events"),
          (floor(col("viterbi_logprob") * 1e9) / 1e9).as("viterbi_logprob"),
          col("best_end_state"))
        .orderBy(col("user_id")), {
      def lg(x: Double) = dlit(math.log(x))
      val (l00, l01, l10, l11) = (lg(0.85), lg(0.15), lg(0.25), lg(0.75))
      val (lpi0, lpi1) = (lg(0.6), lg(0.4))
      val le0 = s"""CASE event_type WHEN 'click' THEN ${lg(0.3)}
                 WHEN 'view' THEN ${lg(0.4)} WHEN 'signup' THEN ${lg(0.1)}
                 WHEN 'purchase' THEN ${lg(0.05)}
                 WHEN 'error' THEN ${lg(0.15)} ELSE ${lg(0.2)} END"""
      val le1 = s"""CASE event_type WHEN 'click' THEN ${lg(0.15)}
                 WHEN 'view' THEN ${lg(0.1)} WHEN 'signup' THEN ${lg(0.15)}
                 WHEN 'purchase' THEN ${lg(0.5)}
                 WHEN 'error' THEN ${lg(0.1)} ELSE ${lg(0.2)} END"""
      Some(s"""
      WITH RECURSIVE seq AS (
        SELECT user_id,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS pos,
               $le0 AS le0,
               $le1 AS le1
        FROM events),
      lens AS (SELECT user_id, max(pos) AS n FROM seq GROUP BY 1),
      f AS (
        SELECT user_id, pos,
               greatest($lpi0 + $l00, $lpi1 + $l10) + le0 AS v0,
               greatest($lpi0 + $l01, $lpi1 + $l11) + le1 AS v1
        FROM seq WHERE pos = 1
        UNION ALL
        SELECT s.user_id, s.pos,
               greatest(f.v0 + $l00, f.v1 + $l10) + s.le0,
               greatest(f.v0 + $l01, f.v1 + $l11) + s.le1
        FROM f JOIN seq s ON s.user_id = f.user_id AND s.pos = f.pos + 1)
      SELECT f.user_id, CAST(l.n AS BIGINT) AS n_events,
             floor(greatest(f.v0, f.v1) * 1e9) / 1e9 AS viterbi_logprob,
             CAST(CASE WHEN f.v0 >= f.v1 THEN 0 ELSE 1 END AS INT)
               AS best_end_state
      FROM f JOIN lens l ON l.user_id = f.user_id AND f.pos = l.n
      ORDER BY f.user_id
      """.trim)
    })

  /** Matryoshka truncation audit ([[Similarity.dimTruncationRecall]]):
    * top-10 recall of prefix-truncated cosine retrieval (dims 8/16/32/
    * 64) against full-width retrieval, per probe query. The oracle
    * replays the q58 brute-cosine pattern once per prefix width.
    */
  val q307TruncationRecall = HarnessQuery(
    "q307_truncation_recall",
    (spark, dir) => {
      val em = Tables.embeddings(spark, dir)
      graft.operators.Similarity.dimTruncationRecall(
        em, em.filter(pmod(col("vec_id"), lit(100L)) === 0),
        "vec_id", "embedding", Seq(8, 16, 32, 64), k = 10)
        .orderBy(col("dim"), col("query_id"))
    }, {
      val dims = Seq(8, 16, 32, 64)
      val ctes = dims.map { d =>
        s"""n$d AS (
        SELECT vec_id, embedding,
               sqrt(CAST(sum(CAST(CAST(embedding[g.i] AS DOUBLE)
                 * CAST(embedding[g.i] AS DOUBLE)
                 AS DECIMAL(30,18))) AS DOUBLE)) AS nrm
        FROM embeddings, generate_series(1, $d) g(i) GROUP BY 1, 2),
      p$d AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(sum(CAST(CAST(q.embedding[g.i] AS DOUBLE)
                 * CAST(c.embedding[g.i] AS DOUBLE)
                 AS DECIMAL(30,18))) AS DOUBLE)
                 / (any_value(q.nrm) * any_value(c.nrm)) AS cosine
        FROM n$d q, n$d c, generate_series(1, $d) g(i)
        WHERE q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id
        GROUP BY 1, 2),
      t$d AS (
        SELECT $d AS dim, query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id, row_number() OVER
            (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
            AS rank
          FROM p$d) WHERE rank <= 10)"""
      }.mkString(",\n      ")
      val unions = dims.map(d => s"SELECT * FROM t$d")
        .mkString(" UNION ALL ")
      Some(s"""
      WITH $ctes,
      alld AS ($unions)
      SELECT CAST(a.dim AS INT) AS dim, a.query_id,
             CAST(sum(CASE WHEN f.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
               AS DOUBLE) / 10.0 AS recall
      FROM alld a LEFT JOIN t64 f ON f.query_id = a.query_id
        AND f.neighbor_id = a.neighbor_id
      GROUP BY 1, 2 ORDER BY dim, a.query_id
      """.trim)
    })

  /** Mergeable partial-aggregate audit ([[ScaleAudit.partialAggAudit]]):
    * 8 shard summaries merged vs the direct pass — the map-side-combine
    * associativity contract, checked bit-for-bit (decimal sums).
    */
  val q308PartialMerge = HarnessQuery(
    "q308_partial_merge",
    (spark, dir) =>
      graft.operators.ScaleAudit.partialAggAudit(
        Tables.events(spark, dir), pmod(col("event_id"), lit(8L)),
        "event_type", "value")
        .orderBy(col("event_type")),
    Some("""
      WITH partials AS (
        SELECT event_id % 8 AS shard, event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(30,6))) AS DECIMAL(30,6)) AS s,
               min(value) AS mn, max(value) AS mx
        FROM events GROUP BY 1, 2),
      merged AS (
        SELECT event_type, CAST(sum(n) AS BIGINT) AS n,
               CAST(sum(s) AS DECIMAL(30,6)) AS s,
               min(mn) AS vmin, max(mx) AS vmax
        FROM partials GROUP BY 1),
      direct AS (
        SELECT event_type, count(*) AS dn,
               CAST(sum(CAST(value AS DECIMAL(30,6))) AS DECIMAL(30,6)) AS ds,
               min(value) AS dmn, max(value) AS dmx
        FROM events GROUP BY 1)
      SELECT m.event_type, m.n, CAST(m.s AS DOUBLE) AS total,
             m.vmin, m.vmax,
             (m.n = d.dn AND m.s = d.ds AND m.vmin = d.dmn
               AND m.vmax = d.dmx) AS merge_exact
      FROM merged m JOIN direct d USING (event_type)
      ORDER BY event_type
    """.trim))

  /** Interval-overlap join ([[graft.operators.RangeJoin
    * .intervalOverlapJoin]]): per user, click windows [ts, ts+value s]
    * overlapping purchase windows — hour-bucketed equi-join with the
    * canonical-bucket dedup; the oracle does the direct theta-join
    * (equivalent by construction, fine at oracle scale).
    */
  val q309IntervalOverlap = HarnessQuery(
    "q309_interval_overlap",
    (spark, dir) => {
      val iv = Tables.events(spark, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("s"),
          // value-MINUTE windows: long enough to span several hour
          // buckets, so the canonical-bucket dedup is actually exercised
          (unix_micros(col("ts")) +
            floor(col("value") * 6e7).cast("long")).as("e"))
      val a = iv.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("a_id"),
          col("s").as("a_s"), col("e").as("a_e"))
      val b = iv.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("b_id"),
          col("s").as("b_s"), col("e").as("b_e"))
      graft.operators.RangeJoin.intervalOverlapJoin(
        a, b, "a_s", "a_e", "b_s", "b_e", Seq("user_id"),
        bucketWidth = 3600L * 1000000L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(least(col("a_e"), col("b_e")) -
            greatest(col("a_s"), col("b_s"))).as("total_overlap_us"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH iv AS (
        SELECT event_id, user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS s,
               epoch_us(CAST(ts AS TIMESTAMP))
                 + CAST(floor(value * 6e7) AS BIGINT) AS e
        FROM events WHERE event_type IN ('click', 'purchase')),
      a AS (SELECT user_id, event_id AS a_id, s AS a_s, e AS a_e
            FROM iv WHERE event_type = 'click'),
      b AS (SELECT user_id, event_id AS b_id, s AS b_s, e AS b_e
            FROM iv WHERE event_type = 'purchase'),
      p AS (
        SELECT a.user_id, a_id, b_id,
               least(a_e, b_e) - greatest(a_s, b_s) AS ov
        FROM a JOIN b USING (user_id)
        -- malformed intervals (end < start) match nothing, mirroring
        -- intervalOverlapJoin's pre-bucketing filter
        WHERE a_s <= b_e AND b_s <= a_e
          AND a_e >= a_s AND b_e >= b_s)
      SELECT user_id, count(*) AS n_pairs,
             CAST(sum(ov) AS BIGINT) AS total_overlap_us
      FROM p GROUP BY 1 ORDER BY user_id
    """.trim))

  /** 2-D skyline ([[graft.operators.Eda.skyline2d]]): customers on the
    * Pareto frontier of (exact total order value, order count) — no
    * other customer is at least as good on both axes and better on one.
    */
  val q310Skyline = HarnessQuery(
    "q310_skyline",
    (spark, dir) => {
      val base = Tables.orders(spark, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(30,6)")).cast("double")
          .as("total"), count(lit(1)).as("n_orders"))
      graft.operators.Eda.skyline2d(base, "total", "n_orders")
        .select(col("o_custkey").as("custkey"), col("total"),
          col("n_orders"))
        .orderBy(col("custkey"))
    },
    Some("""
      WITH base AS (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                 AS total,
               count(*) AS n FROM orders GROUP BY 1),
      perx AS (SELECT total, max(n) AS ymax FROM base GROUP BY 1),
      fr AS (
        SELECT total, ymax, max(ymax) OVER (ORDER BY total DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
        FROM perx),
      sky AS (SELECT total, ymax FROM fr WHERE prev IS NULL OR ymax > prev)
      SELECT b.o_custkey AS custkey, b.total,
             CAST(b.n AS BIGINT) AS n_orders
      FROM base b JOIN sky s ON b.total = s.total AND b.n = s.ymax
      ORDER BY custkey
    """.trim))

  /** Incremental view maintenance ([[graft.operators.Merge
    * .applyAggDelta]]): a per-type (count, sum) view built from 70% of
    * events, maintained by a delta stream of inserts (the other 30%)
    * and retractions (10% of the original) — then checked bit-for-bit
    * against the direct aggregate of the final row set.
    */
  val q311IvmDelta = HarnessQuery(
    "q311_ivm_delta",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .select(col("event_type"), col("value"),
          pmod(col("event_id"), lit(10L)).as("__m"))
      val state = ev.filter(col("__m") < 7).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(30,6)")).cast("decimal(30,6)")
            .as("s"))
      val deltas = ev.filter(col("__m") >= 7).withColumn("op", lit(1))
        .unionByName(ev.filter(col("__m") === 0).withColumn("op", lit(-1)))
      val applied = graft.operators.Merge.applyAggDelta(
        state, deltas, "event_type", "n", "s", "op", "value")
      val direct = ev.filter(col("__m") =!= 0).groupBy(col("event_type"))
        .agg(count(lit(1)).as("dn"),
          sum(col("value").cast("decimal(30,6)")).cast("decimal(30,6)")
            .as("ds"))
      applied.join(direct, Seq("event_type"))
        .select(col("event_type"), col("n"),
          col("s").cast("double").as("total"),
          (col("n") === col("dn") && col("s") === col("ds"))
            .as("consistent"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH ev AS (
        SELECT event_type, value, event_id % 10 AS m FROM events),
      state AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(30,6))) AS DECIMAL(30,6)) AS s
        FROM ev WHERE m < 7 GROUP BY 1),
      deltas AS (
        SELECT event_type, value, 1 AS op FROM ev WHERE m >= 7
        UNION ALL
        SELECT event_type, value, -1 AS op FROM ev WHERE m = 0),
      d AS (
        SELECT event_type, CAST(sum(op) AS BIGINT) AS dn,
               CAST(sum(CAST(op * value AS DECIMAL(30,6)))
                 AS DECIMAL(30,6)) AS ds
        FROM deltas GROUP BY 1),
      applied AS (
        SELECT COALESCE(state.event_type, d.event_type) AS event_type,
               COALESCE(state.n, 0) + COALESCE(d.dn, 0) AS n,
               CAST(COALESCE(state.s, 0::DECIMAL(30,6))
                 + COALESCE(d.ds, 0::DECIMAL(30,6)) AS DECIMAL(30,6)) AS s
        FROM state FULL OUTER JOIN d ON state.event_type = d.event_type),
      direct AS (
        SELECT event_type, count(*) AS dn,
               CAST(sum(CAST(value AS DECIMAL(30,6))) AS DECIMAL(30,6))
                 AS ds
        FROM ev WHERE m <> 0 GROUP BY 1)
      SELECT a.event_type, a.n, CAST(a.s AS DOUBLE) AS total,
             (a.n = direct.dn AND a.s = direct.ds) AS consistent
      FROM applied a JOIN direct USING (event_type)
      WHERE a.n > 0 ORDER BY a.event_type
    """.trim))

  def all: Seq[HarnessQuery] = Seq(
    q300LdaEstep, q301Interpolate, q302GeoNearest, q303PsmAtt,
    q304HmmForward, q305LdaTopWords, q306HmmViterbi,
    q307TruncationRecall, q308PartialMerge, q309IntervalOverlap,
    q310Skyline, q311IvmDelta)
}

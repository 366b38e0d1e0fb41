package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Association, Components, Density, Experiment,
  Graphs, LinAlg, RankStats, Resample, Sketches, TextDedup, TimeSeries}
import graft.sources.Tables

/** Round-7 estimator additions: HyperLogLog cardinality sketching with
  * an exact-error audit, closed-form ridge regression from one moment
  * aggregate, and Holt double-exponential smoothing folded over the
  * bounded daily series. Each oracle replays the same arithmetic
  * (integer harmonic sums, fixed-order Cramer expansion, recursive CTE
  * for the smoothing recursion).
  */
object SketchQueries {

  /** HLL distinct sketch ([[Sketches.hllDistinct]], m = 64) over two
    * item domains of lineitem — l_partkey per return flag (large:
    * raw harmonic estimate) and l_linenumber per return flag (tiny:
    * exercises the linear-counting small-range correction) — with the
    * exact distinct count and relative error beside each estimate.
    */
  val q312HllDistinct = HarnessQuery(
    "q312_hll_distinct",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
      def side(metric: String, item: String) =
        Sketches.hllDistinct(
          li.select(col("l_returnflag").as("grp"), col(item).as("item")),
          "grp", "item")
          .withColumn("metric", lit(metric))
      side("partkey", "l_partkey")
        .unionByName(side("linenumber", "l_linenumber"))
        .select(col("metric"), col("grp"), col("used_registers"),
          col("zero_registers"), col("est"), col("exact"), col("rel_err"))
        .orderBy(col("metric"), col("grp"))
    },
    Some("""
      WITH src AS (
        SELECT 'partkey' AS metric, l_returnflag AS grp,
               CAST(l_partkey AS VARCHAR) AS item FROM lineitem
        UNION ALL
        SELECT 'linenumber', l_returnflag, CAST(l_linenumber AS VARCHAR)
        FROM lineitem),
      h AS (
        SELECT metric, grp,
               CAST(('0x' || substr(md5(item), 1, 15)) AS BIGINT) AS h
        FROM src),
      b AS (SELECT metric, grp, h % 64 AS b, h // 64 AS w FROM h),
      r AS (
        SELECT metric, grp, b,
               CAST(max(CASE WHEN w = 0 THEN 54
                 ELSE 55 - length(bin(w)) END) AS INT) AS m
        FROM b GROUP BY 1, 2, 3),
      agg AS (
        SELECT metric, grp, CAST(count(*) AS INT) AS used_registers,
               CAST(sum(CAST(1 AS BIGINT) << (54 - m)) AS BIGINT) AS s0
        FROM r GROUP BY 1, 2),
      est AS (
        SELECT metric, grp, used_registers,
               64 - used_registers AS zero_registers,
               (CAST(0.709 AS DOUBLE) * 64 * 64 * 18014398509481984.0)
                 / CAST(s0 + CAST(64 - used_registers AS BIGINT)
                     * 18014398509481984 AS DOUBLE) AS raw
        FROM agg),
      ex AS (
        SELECT metric, grp, count(DISTINCT item) AS exact
        FROM src GROUP BY 1, 2),
      fin AS (
        SELECT est.metric, est.grp, used_registers, zero_registers,
               CASE WHEN raw <= 160.0 AND zero_registers > 0
                    THEN 64.0 * ln(64.0 / zero_registers)
                    ELSE raw END AS e,
               ex.exact
        FROM est JOIN ex ON est.metric = ex.metric AND est.grp = ex.grp)
      SELECT metric, grp, used_registers, zero_registers,
             floor(e * 1e6) / 1e6 AS est, exact,
             floor(abs(e - exact) / exact * 1e6) / 1e6 AS rel_err
      FROM fin ORDER BY metric, grp
    """.trim))

  /** Ridge fit of l_extendedprice ~ l_quantity + l_discount
    * ([[LinAlg.ridgeNormalEq]], lambda = 10): the whole fit is one
    * nine-moment aggregate plus a literal Cramer solve, replayed
    * symbol-for-symbol in the oracle.
    */
  val q314RidgeFit = HarnessQuery(
    "q314_ridge_fit",
    (spark, dir) =>
      LinAlg.ridgeNormalEq(Tables.lineitem(spark, dir),
        "l_extendedprice", "l_quantity", "l_discount", lambda = 10.0)
        .orderBy(col("feature")),
    Some("""
      WITH m AS (
        SELECT
          CAST(count(*) AS DOUBLE) AS a11,
          CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) AS a12,
          CAST(sum(CAST(l_discount AS DECIMAL(30,10))) AS DOUBLE) AS a13,
          CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(30,10)))
            AS DOUBLE) + 10.0 AS a22,
          CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(30,10)))
            AS DOUBLE) AS a23,
          CAST(sum(CAST(l_discount * l_discount AS DECIMAL(30,10)))
            AS DOUBLE) + 10.0 AS a33,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) AS b1,
          CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(30,10)))
            AS DOUBLE) AS b2,
          CAST(sum(CAST(l_discount * l_extendedprice AS DECIMAL(30,10)))
            AS DOUBLE) AS b3
        FROM lineitem),
      sol AS (
        SELECT
          a11 * (a22 * a33 - a23 * a23)
            - a12 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * a23 - a22 * a13) AS det,
          b1 * (a22 * a33 - a23 * a23)
            - a12 * (b2 * a33 - a23 * b3)
            + a13 * (b2 * a23 - a22 * b3) AS d0,
          a11 * (b2 * a33 - a23 * b3)
            - b1 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * b3 - b2 * a13) AS d1,
          a11 * (a22 * b3 - b2 * a23)
            - a12 * (a12 * b3 - b2 * a13)
            + b1 * (a12 * a23 - a22 * a13) AS d2
        FROM m)
      SELECT 'intercept' AS feature,
             floor(d0 / det * 1e6) / 1e6 AS beta FROM sol
      UNION ALL
      SELECT 'l_quantity', floor(d1 / det * 1e6) / 1e6 FROM sol
      UNION ALL
      SELECT 'l_discount', floor(d2 / det * 1e6) / 1e6 FROM sol
      ORDER BY feature
    """.trim))

  /** Holt linear smoothing of the daily event-count series
    * ([[TimeSeries.holtLinear]], alpha = 0.3, gamma = 0.2): the
    * oracle unrolls the same recursion with a recursive CTE over the
    * row-numbered day series.
    */
  val q317HoltTrend = HarnessQuery(
    "q317_holt_trend",
    (spark, dir) =>
      TimeSeries.holtLinear(Tables.events(spark, dir), "ts",
        alpha = 0.3, gamma = 0.2)
        .orderBy(col("day")),
    Some("""
      WITH RECURSIVE d AS (
        SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                 AS BIGINT) AS day,
               CAST(count(*) AS DOUBLE) AS x
        FROM events GROUP BY 1),
      o AS (SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM d),
      it AS (
        SELECT o1.rn, o1.day, o1.x, o1.x AS s, o2.x - o1.x AS b
        FROM o o1 JOIN o o2 ON o2.rn = 2 WHERE o1.rn = 1
        UNION ALL
        SELECT o.rn, o.day, o.x,
               0.3 * o.x + 0.7 * (it.s + it.b) AS s,
               0.2 * ((0.3 * o.x + 0.7 * (it.s + it.b)) - it.s)
                 + 0.8 * it.b AS b
        FROM o JOIN it ON o.rn = it.rn + 1)
      SELECT day, x, floor(s * 1e9) / 1e9 AS level,
             floor(b * 1e9) / 1e9 AS trend
      FROM it ORDER BY day
    """.trim))

  /** Exact Jaccard-threshold join via prefix filtering
    * ([[TextDedup.prefixFilterJaccardPairs]], 3-shingles, t = 0.6).
    * Prefix filtering is LOSSLESS (candidate recall 1 by theorem), so
    * the oracle brute-forces ground-truth pairwise Jaccard — any
    * filter bug shows up as a missing row, not a replayed one.
    */
  val q313PrefixJaccard = HarnessQuery(
    "q313_prefix_jaccard",
    (spark, dir) =>
      TextDedup.prefixFilterJaccardPairs(
        Tables.documents(spark, dir), "text", "doc_id",
        n = 3, threshold = 0.6)
        .select(col("id_a"), col("id_b"),
          (floor(col("jaccard") * 1e12) / 1e12).as("jaccard"))
        .orderBy(col("id_a"), col("id_b")),
    Some("""
      WITH t AS (SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, len(regexp_split_to_array(trim(lower(text)), '\s+')) - 2),
                     i -> array_to_string((regexp_split_to_array(trim(lower(text)), '\s+'))[i:i+2], ' ')))
                     AS sh
                 FROM documents),
      p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
               CAST(len(a.sh) + len(b.sh)
                 - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS j
        FROM t a, t b WHERE a.doc_id < b.doc_id)
      SELECT id_a, id_b, floor(j * 1e12) / 1e12 AS jaccard
      FROM p WHERE j >= CAST(0.6 AS DOUBLE)
      ORDER BY id_a, id_b
    """.trim))

  /** Modularity of the near-dup component partition over the minhash
    * pair graph ([[Graphs.modularity]]): components over their own
    * edges score near the theoretical ceiling — the audit that a
    * clustering actually explains the graph's edge mass.
    */
  val q316Modularity = HarnessQuery(
    "q316_modularity",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      // cut once (round 13): the pair graph feeds BOTH the component
      // loop and the modularity score — uncut, the minhash pipeline
      // executed twice
      val pairs = graft.Materialize.cut(TextDedup.minhashNearDupPairs(
        docs, "text", "doc_id", hashFn = TextFunctions.fastHash))
      val assign = Components.connectedComponents(
        docs.select(col("doc_id")), pairs, "doc_id")
      Graphs.modularity(assign, "doc_id", "cluster_id", pairs)
    },
    Some("""
      WITH RECURSIVE t AS (SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, len(regexp_split_to_array(trim(lower(text)), '\s+')) - 2),
                     i -> array_to_string((regexp_split_to_array(trim(lower(text)), '\s+'))[i:i+2], ' ')))
                     AS sh
                 FROM documents),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM t a, t b
                WHERE a.doc_id < b.doc_id
                  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
      reach(id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
      clusters AS (
        SELECT id AS doc_id, min(label) AS cluster_id
        FROM reach GROUP BY id),
      lab AS (
        SELECT p.id_a, p.id_b, ca.cluster_id AS ca, cb.cluster_id AS cb
        FROM pairs p
        JOIN clusters ca ON p.id_a = ca.doc_id
        JOIN clusters cb ON p.id_b = cb.doc_id),
      c1 AS (
        SELECT count(*) AS m_edges,
               CAST(sum(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS BIGINT)
                 AS intra_edges
        FROM lab),
      deg AS (
        SELECT v, c, count(*) AS d FROM (
          SELECT id_a AS v, ca AS c FROM lab
          UNION ALL SELECT id_b, cb FROM lab) u GROUP BY 1, 2),
      dc AS (SELECT c, CAST(sum(d) AS BIGINT) AS dc FROM deg GROUP BY 1),
      c2 AS (SELECT CAST(sum(dc * dc) AS BIGINT) AS deg_sq_sum FROM dc),
      c3 AS (SELECT count(DISTINCT cluster_id) AS n_clusters FROM clusters)
      SELECT n_clusters, m_edges, intra_edges,
             floor(CAST(4 * m_edges * intra_edges - deg_sq_sum AS DOUBLE)
               / (CAST(4 AS DOUBLE) * CAST(m_edges AS DOUBLE)
                 * CAST(m_edges AS DOUBLE)) * 1e9) / 1e9 AS q_modularity
      FROM c1, c2, c3
    """.trim))

  /** One round of the Louvain oracle: from assignment `prev` (id, c),
    * compute community degree totals, per-vertex edges-into-community,
    * the integer gain s(v,c) = 2m·kvc − k_v·(tot_c − [c=c_v]·k_v),
    * and let parity-gated vertices adopt the argmax (score desc,
    * community asc) — the exact [[Graphs.louvainOneLevel]] round.
    */
  private def louvainRoundSql(prev: String, nxt: String, parity: Int): String =
    s"""      tot_$nxt AS (SELECT p.c, CAST(sum(coalesce(deg.k, 0)) AS BIGINT) AS tot
             FROM $prev p LEFT JOIN deg ON deg.u = p.id GROUP BY 1),
      kvc_$nxt AS (SELECT und.u AS id, p.c AS cand,
                    CAST(count(*) AS BIGINT) AS kvc
             FROM und JOIN $prev p ON p.id = und.v GROUP BY 1, 2),
      cand_$nxt AS (SELECT id, cand, max(kvc) AS kvc FROM (
               SELECT id, cand, kvc FROM kvc_$nxt
               UNION ALL SELECT id, c, CAST(0 AS BIGINT) FROM $prev)
             GROUP BY 1, 2),
      sc_$nxt AS (SELECT cd.id, cd.cand,
               2 * m.m * cd.kvc
                 - coalesce(dv.k, 0) * (t.tot - CASE WHEN cd.cand = cv.c
                     THEN coalesce(dv.k, 0) ELSE 0 END) AS s
             FROM cand_$nxt cd
             JOIN $prev cv ON cv.id = cd.id
             LEFT JOIN deg dv ON dv.u = cd.id
             JOIN tot_$nxt t ON t.c = cd.cand, m),
      $nxt AS MATERIALIZED (SELECT cv.id,
               CASE WHEN cv.id % 2 = $parity THEN w.cand ELSE cv.c END AS c
             FROM $prev cv JOIN (SELECT id, cand FROM (
               SELECT id, cand, row_number() OVER (PARTITION BY id
                 ORDER BY s DESC, cand) AS r
               FROM sc_$nxt) WHERE r = 1) w ON w.id = cv.id)"""

  /** One-level Louvain modularity ascent
    * ([[Graphs.louvainOneLevel]], 4 parity-gated synchronous rounds)
    * over the q316 near-dup graph: communities found by maximizing the
    * integer ΔQ numerator, not merely scored. The oracle re-derives the
    * brute-force edge set and replays all four rounds.
    */
  val q335Louvain = HarnessQuery(
    "q335_louvain",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      // materialize the pair graph once: it feeds multiple consumers
      // below, and uncut each would re-run the minhash near-dup join
      val pairs = graft.Materialize.cut(TextDedup.minhashNearDupPairs(
        docs, "text", "doc_id", hashFn = TextFunctions.fastHash))
      Graphs.louvainOneLevel(docs.select(col("doc_id")), "doc_id",
          pairs, rounds = 4)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH t AS (SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, len(regexp_split_to_array(trim(lower(text)), '\\s+')) - 2),
                     i -> array_to_string((regexp_split_to_array(trim(lower(text)), '\\s+'))[i:i+2], ' ')))
                     AS sh
                 FROM documents),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM t a, t b
                WHERE a.doc_id < b.doc_id
                  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
      und AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
      deg AS (SELECT u, CAST(count(*) AS BIGINT) AS k FROM und GROUP BY 1),
      m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
      c0 AS (SELECT doc_id AS id, doc_id AS c FROM documents),
${louvainRoundSql("c0", "c1", 0)},
${louvainRoundSql("c1", "c2", 1)},
${louvainRoundSql("c2", "c3", 0)},
${louvainRoundSql("c3", "c4", 1)}
      SELECT id AS doc_id, c AS community FROM c4 ORDER BY doc_id
    """.trim))

  /** One mutual-best community MERGE round over the coarse
    * super-graph (ce/degb/m2 CTEs) — the
    * [[Graphs.communityMergeRounds]] round: pair gains
    * 4m·w − 2·tot_a·tot_b, rank-1 proposals per community (gain desc,
    * pair-hash, partner), mutual pairs relabel larger -> smaller.
    */
  private def louvainMergeRoundSql(
      prev: String, nxt: String, ce: String = "ce",
      degb: String = "degb", m2: String = "m2"): String =
    s"""      tot_$nxt AS MATERIALIZED (SELECT p.c, CAST(sum(coalesce($degb.deg, 0)) AS BIGINT) AS tot
             FROM $prev p LEFT JOIN $degb ON $degb.sv = p.sv GROUP BY 1),
      w_$nxt AS (SELECT least(a.c, b.c) AS pa, greatest(a.c, b.c) AS pb,
                    CAST(sum($ce.w) AS BIGINT) AS w
             FROM $ce JOIN $prev a ON a.sv = $ce.ea
                     JOIN $prev b ON b.sv = $ce.eb
             WHERE a.c <> b.c GROUP BY 1, 2),
      g_$nxt AS MATERIALIZED (SELECT pa, pb,
                    4 * $m2.m * w.w - 2 * ta.tot * tb.tot AS g,
                    CAST(('0x' || substr(md5(CAST(pa AS VARCHAR) || '_'
                      || CAST(pb AS VARCHAR)), 1, 15)) AS BIGINT) AS h
             FROM w_$nxt w
             JOIN tot_$nxt ta ON ta.c = w.pa
             JOIN tot_$nxt tb ON tb.c = w.pb, $m2
             WHERE 4 * $m2.m * w.w - 2 * ta.tot * tb.tot > 0),
      b_$nxt AS MATERIALIZED (SELECT src, dst FROM (
               SELECT src, dst,
                      row_number() OVER (PARTITION BY src
                        ORDER BY g DESC, h, dst) AS r
               FROM (SELECT pa AS src, pb AS dst, g, h FROM g_$nxt
                     UNION ALL SELECT pb, pa, g, h FROM g_$nxt))
             WHERE r = 1),
      $nxt AS MATERIALIZED (SELECT p.sv, coalesce(mu.t, p.c) AS c
             FROM $prev p LEFT JOIN (
               SELECT x.src AS f, x.dst AS t
               FROM b_$nxt x JOIN b_$nxt y
                 ON y.src = x.dst AND y.dst = x.src
               WHERE x.src > x.dst) mu ON mu.f = p.c)"""

  /** Weighted modularity of the two-level partition scored ON THE
    * COARSE GRAPH ([[Graphs.modularityWeighted]]): coarsening is
    * Q-lossless (self-loops carry intra mass fully, degrees double
    * it), so this score EQUALS the original-graph modularity of the
    * expanded partition — the invariant that justifies optimizing at
    * the coarse level, spec-pinned and here oracle-replayed end to
    * end (half-corpus slice, 2-round level 1 — see q373 —
    * coarsening, both merge rounds, the weighted score).
    */
  val q376CoarseModularity = HarnessQuery(
    "q376_coarse_modularity",
    (spark, dir) => {
      // half-corpus slice (see q373): the shared pair-graph prefix is
      // benched at full scale by q335/q372; the oracle replays the slice
      val docs = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(2L)) === 0)
      // materialize the pair graph once: it feeds multiple consumers
      // below, and uncut each would re-run the minhash near-dup join
      val pairs = graft.Materialize.cut(TextDedup.minhashNearDupPairs(
        docs, "text", "doc_id", hashFn = TextFunctions.fastHash))
      val l1 = Graphs.louvainOneLevel(docs.select(col("doc_id")),
        "doc_id", pairs, rounds = 2)
      // cut: merge rounds + the scorer re-reference the coarse graph
      // several times; without a lineage cut each reference re-derives
      // the LSH near-dup pair join (measured: 2x the q372 bench time)
      val coarse = graft.Materialize.cut(
        Graphs.coarsenByCommunity(l1, "doc_id", "community", pairs))
      val merged = Graphs.communityMergeRounds(
        l1.select(col("community")).distinct(), "community", coarse,
        rounds = 2)
      Graphs.modularityWeighted(merged, "sv", "community", coarse)
    },
    Some(s"""
      WITH t AS MATERIALIZED (SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, len(regexp_split_to_array(trim(lower(text)), '\\s+')) - 2),
                     i -> array_to_string((regexp_split_to_array(trim(lower(text)), '\\s+'))[i:i+2], ' ')))
                     AS sh
                 FROM documents WHERE doc_id % 2 = 0),
      pairs AS MATERIALIZED (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM t a, t b
                WHERE a.doc_id < b.doc_id
                  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
      und AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
      deg AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS k FROM und GROUP BY 1),
      m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
      c0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS c FROM documents WHERE doc_id % 2 = 0),
${louvainRoundSql("c0", "c1", 0)},
${louvainRoundSql("c1", "c2", 1)},
      ce AS MATERIALIZED (SELECT least(x.c, y.c) AS ea, greatest(x.c, y.c) AS eb,
                    CAST(count(*) AS BIGINT) AS w
             FROM pairs p
             JOIN c2 x ON x.id = p.id_a
             JOIN c2 y ON y.id = p.id_b
             GROUP BY 1, 2),
      degb AS MATERIALIZED (SELECT sv, CAST(sum(d) AS BIGINT) AS deg FROM (
                 SELECT ea AS sv,
                        CASE WHEN ea = eb THEN 2 * w ELSE w END AS d
                 FROM ce
                 UNION ALL SELECT eb, w FROM ce WHERE ea <> eb)
               GROUP BY 1),
      m2 AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM ce),
      d0 AS MATERIALIZED (SELECT DISTINCT c AS sv, c FROM c2),
${louvainMergeRoundSql("d0", "d1")},
${louvainMergeRoundSql("d1", "d2")},
      lab AS (SELECT ce.ea, ce.eb, ce.w, a.c AS ca, b.c AS cb
              FROM ce JOIN d2 a ON a.sv = ce.ea
                      JOIN d2 b ON b.sv = ce.eb),
      c1m AS (SELECT CAST(sum(w) AS BIGINT) AS m_weight,
                     CAST(sum(CASE WHEN ca = cb THEN w ELSE 0 END)
                       AS BIGINT) AS intra_weight
              FROM lab),
      dgc AS (SELECT c, CAST(sum(d) AS BIGINT) AS dc FROM (
                SELECT ca AS c,
                       CASE WHEN ea = eb THEN 2 * w ELSE w END AS d
                FROM lab
                UNION ALL SELECT cb, w FROM lab WHERE ea <> eb)
              GROUP BY 1),
      c2m AS (SELECT CAST(sum(dc * dc) AS BIGINT) AS deg_sq FROM dgc),
      c3m AS (SELECT CAST(count(DISTINCT c) AS BIGINT) AS n_clusters
              FROM d2)
      SELECT n_clusters, m_weight, intra_weight,
             floor(CAST(4 * m_weight * intra_weight - deg_sq AS DOUBLE)
               / (CAST(4 AS DOUBLE) * CAST(m_weight AS DOUBLE)
                 * CAST(m_weight AS DOUBLE)) * 1e9) / 1e9 AS q_modularity
      FROM c1m, c2m, c3m
    """.trim))

  /** Cluster-vs-source agreement
    * ([[Association.normalizedMutualInformation]]): NMI between the
    * Louvain near-dup communities and the documents' source labels —
    * the standard external-validity score for any clustering the
    * pipeline produces. The oracle replays all four Louvain rounds,
    * the contingency counts, the rounded-at-12 decimal-accumulated
    * MI/entropy sums, and the floored normalization.
    */
  val q381ClusterNmi = HarnessQuery(
    "q381_cluster_nmi",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      // materialize the pair graph once: it feeds multiple consumers
      // below, and uncut each would re-run the minhash near-dup join
      val pairs = graft.Materialize.cut(TextDedup.minhashNearDupPairs(
        docs, "text", "doc_id", hashFn = TextFunctions.fastHash))
      val comm = Graphs.louvainOneLevel(docs.select(col("doc_id")),
        "doc_id", pairs, rounds = 4)
      Association.normalizedMutualInformation(
        comm.join(docs.select(col("doc_id"), col("source")),
          Seq("doc_id")),
        "community", "source")
    },
    Some(s"""
      WITH t AS MATERIALIZED (SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, len(regexp_split_to_array(trim(lower(text)), '\\s+')) - 2),
                     i -> array_to_string((regexp_split_to_array(trim(lower(text)), '\\s+'))[i:i+2], ' ')))
                     AS sh
                 FROM documents),
      pairs AS MATERIALIZED (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM t a, t b
                WHERE a.doc_id < b.doc_id
                  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
      und AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
      deg AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS k FROM und GROUP BY 1),
      m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
      c0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS c FROM documents),
${louvainRoundSql("c0", "c1", 0)},
${louvainRoundSql("c1", "c2", 1)},
${louvainRoundSql("c2", "c3", 0)},
${louvainRoundSql("c3", "c4", 1)},
      pr AS MATERIALIZED (SELECT c4.c AS community, d.source
              FROM c4 JOIN documents d ON d.doc_id = c4.id),
      ab AS MATERIALIZED (SELECT community, source, count(*) AS n_ab
             FROM pr GROUP BY 1, 2),
      ma AS (SELECT community, CAST(sum(n_ab) AS BIGINT) AS n_a
             FROM ab GROUP BY 1),
      mb AS (SELECT source, CAST(sum(n_ab) AS BIGINT) AS n_b
             FROM ab GROUP BY 1),
      tt AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n FROM ab),
      mic AS (
        SELECT round(CAST(n_ab AS DOUBLE) / CAST(n AS DOUBLE)
                 * ln(CAST(n_ab AS DOUBLE) * CAST(n AS DOUBLE)
                      / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))), 12)
                 AS mc
        FROM ab JOIN ma USING (community) JOIN mb USING (source), tt),
      mi AS (SELECT CAST(sum(CAST(mc AS DECIMAL(38,12))) AS DOUBLE)
               AS mi_raw FROM mic),
      ea AS (SELECT CAST(count(*) AS BIGINT) AS n_a_classes,
                    CAST(sum(CAST(round(CAST(n_a AS DOUBLE)
                      / CAST(tt.n AS DOUBLE)
                      * ln(CAST(tt.n AS DOUBLE) / CAST(n_a AS DOUBLE)), 12)
                      AS DECIMAL(38,12))) AS DOUBLE) AS ha
             FROM ma, tt),
      eb AS (SELECT CAST(count(*) AS BIGINT) AS n_b_classes,
                    CAST(sum(CAST(round(CAST(n_b AS DOUBLE)
                      / CAST(tt.n AS DOUBLE)
                      * ln(CAST(tt.n AS DOUBLE) / CAST(n_b AS DOUBLE)), 12)
                      AS DECIMAL(38,12))) AS DOUBLE) AS hb
             FROM mb, tt)
      SELECT tt.n, ea.n_a_classes, eb.n_b_classes,
             round(mi.mi_raw, 12) AS mi_nats,
             round(ea.ha, 12) AS h_a, round(eb.hb, 12) AS h_b,
             CASE WHEN ea.ha > 0 AND eb.hb > 0
                  THEN floor(mi.mi_raw / sqrt(ea.ha * eb.hb) * 1e9) / 1e9
             END AS nmi
      FROM tt, mi, ea, eb
    """.trim))

  /** One WEIGHTED Louvain ascent round over the coarse super-graph
    * (und2/deg2/m2 CTEs): [[louvainRoundSql]]'s exact structure with
    * edge weights summed into the per-candidate mass — the
    * [[Graphs.louvainOneLevelWeighted]] round.
    */
  private def louvainWeightedRoundSql(
      prev: String, nxt: String, parity: Int): String =
    s"""      tot_$nxt AS (SELECT p.c, CAST(sum(coalesce(deg2.k, 0)) AS BIGINT) AS tot
             FROM $prev p LEFT JOIN deg2 ON deg2.u = p.id GROUP BY 1),
      kvc_$nxt AS (SELECT und2.u AS id, p.c AS cand,
                    CAST(sum(und2.w) AS BIGINT) AS kvc
             FROM und2 JOIN $prev p ON p.id = und2.v GROUP BY 1, 2),
      cand_$nxt AS (SELECT id, cand, max(kvc) AS kvc FROM (
               SELECT id, cand, kvc FROM kvc_$nxt
               UNION ALL SELECT id, c, CAST(0 AS BIGINT) FROM $prev)
             GROUP BY 1, 2),
      sc_$nxt AS (SELECT cd.id, cd.cand,
               2 * m2.m * cd.kvc
                 - coalesce(dv.k, 0) * (t.tot - CASE WHEN cd.cand = cv.c
                     THEN coalesce(dv.k, 0) ELSE 0 END) AS s
             FROM cand_$nxt cd
             JOIN $prev cv ON cv.id = cd.id
             LEFT JOIN deg2 dv ON dv.u = cd.id
             JOIN tot_$nxt t ON t.c = cd.cand, m2),
      $nxt AS MATERIALIZED (SELECT cv.id,
               CASE WHEN cv.id % 2 = $parity THEN w.cand ELSE cv.c END AS c
             FROM $prev cv JOIN (SELECT id, cand FROM (
               SELECT id, cand, row_number() OVER (PARTITION BY id
                 ORDER BY s DESC, cand) AS r
               FROM sc_$nxt) WHERE r = 1) w ON w.id = cv.id)"""

  /** Weighted one-level Louvain ascent
    * ([[Graphs.louvainOneLevelWeighted]], 2 parity-gated rounds) over
    * a coarsened near-dup community graph — the weighted-graph form of
    * the ascent, driven on the natural weighted input this pipeline
    * produces (super-vertices with self-loops carrying intra-community
    * mass). Input is the deterministic half corpus (doc_id % 2 = 0)
    * and a 2-round level 1: the full-corpus 4-round pair-graph prefix
    * is benched by q335/q372 and re-paying it here broke the round-10
    * driver bench window. The oracle replays the slice, level 1, the
    * coarsening, and both weighted rounds including the self-loop
    * degree convention (a self-loop counts twice in the degree, never
    * in the into-community mass).
    */
  val q373WeightedLouvain = HarnessQuery(
    "q373_weighted_louvain",
    (spark, dir) => {
      // deterministic half-corpus slice: the minhash pair-graph prefix
      // is shared logic already benched at full scale by q335/q372;
      // re-paying it per query (the harness's per-query independence
      // rule forbids amortizing) broke the round-10 driver bench
      // window. The oracle replays the identical slice.
      val docs = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(2L)) === 0)
      // materialize the pair graph once: it feeds multiple consumers
      // below, and uncut each would re-run the minhash near-dup join
      val pairs = graft.Materialize.cut(TextDedup.minhashNearDupPairs(
        docs, "text", "doc_id", hashFn = TextFunctions.fastHash))
      val l1 = Graphs.louvainOneLevel(docs.select(col("doc_id")),
        "doc_id", pairs, rounds = 2)
      // cut: the weighted ascent derives und/deg/m from the coarse
      // graph separately — uncut, each re-runs the near-dup pair join
      val coarse = graft.Materialize.cut(
        Graphs.coarsenByCommunity(l1, "doc_id", "community", pairs))
      val sv = l1.select(col("community").as("super_vertex")).distinct()
      Graphs.louvainOneLevelWeighted(sv, "super_vertex", coarse,
          rounds = 2)
        .orderBy(col("super_vertex"))
    },
    Some(s"""
      WITH t AS MATERIALIZED (SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, len(regexp_split_to_array(trim(lower(text)), '\\s+')) - 2),
                     i -> array_to_string((regexp_split_to_array(trim(lower(text)), '\\s+'))[i:i+2], ' ')))
                     AS sh
                 FROM documents WHERE doc_id % 2 = 0),
      pairs AS MATERIALIZED (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM t a, t b
                WHERE a.doc_id < b.doc_id
                  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
      und AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
      deg AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS k FROM und GROUP BY 1),
      m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
      c0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS c FROM documents WHERE doc_id % 2 = 0),
${louvainRoundSql("c0", "c1", 0)},
${louvainRoundSql("c1", "c2", 1)},
      ce AS MATERIALIZED (SELECT least(x.c, y.c) AS ea, greatest(x.c, y.c) AS eb,
                    CAST(count(*) AS BIGINT) AS w
             FROM pairs p
             JOIN c2 x ON x.id = p.id_a
             JOIN c2 y ON y.id = p.id_b
             GROUP BY 1, 2),
      und2 AS MATERIALIZED (SELECT ea AS u, eb AS v, w FROM ce WHERE ea <> eb
               UNION ALL SELECT eb, ea, w FROM ce WHERE ea <> eb),
      deg2 AS MATERIALIZED (SELECT u, CAST(sum(w) AS BIGINT) AS k FROM (
                 SELECT u, w FROM und2
                 UNION ALL SELECT ea, 2 * w FROM ce WHERE ea = eb)
               GROUP BY 1),
      m2 AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM ce),
      d0 AS MATERIALIZED (SELECT DISTINCT c AS id, c FROM c2),
${louvainWeightedRoundSql("d0", "d1", 0)},
${louvainWeightedRoundSql("d1", "d2", 1)}
      SELECT id AS super_vertex, c AS community FROM d2 ORDER BY 1
    """.trim))

  /** Two-level Louvain ([[Graphs.louvainTwoLevel]]: 4 parity-gated
    * rounds on the q316 near-dup graph, coarsen communities to
    * weighted super-vertices, 2 mutual-best merge rounds on the
    * coarse graph) — the level recursion that lets whole communities
    * merge at once, with the coarse pass restricted to disjoint
    * positive-gain mutual merges so Q never decreases. The oracle
    * replays the ENTIRE pipeline: brute-force edges, all four level-1
    * rounds, the coarsening aggregates, and both merge rounds
    * including the gain/hash/partner proposal ranking.
    */
  val q372LouvainTwoLevel = HarnessQuery(
    "q372_louvain_two_level",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val pairs = TextDedup.minhashNearDupPairs(
        docs, "text", "doc_id", hashFn = TextFunctions.fastHash)
      Graphs.louvainTwoLevel(docs.select(col("doc_id")), "doc_id",
          pairs, rounds1 = 4, rounds2 = 2)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH t AS MATERIALIZED (SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, len(regexp_split_to_array(trim(lower(text)), '\\s+')) - 2),
                     i -> array_to_string((regexp_split_to_array(trim(lower(text)), '\\s+'))[i:i+2], ' ')))
                     AS sh
                 FROM documents),
      pairs AS MATERIALIZED (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM t a, t b
                WHERE a.doc_id < b.doc_id
                  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
      und AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
      deg AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS k FROM und GROUP BY 1),
      m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
      c0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS c FROM documents),
${louvainRoundSql("c0", "c1", 0)},
${louvainRoundSql("c1", "c2", 1)},
${louvainRoundSql("c2", "c3", 0)},
${louvainRoundSql("c3", "c4", 1)},
      ce AS MATERIALIZED (SELECT least(x.c, y.c) AS ea, greatest(x.c, y.c) AS eb,
                    CAST(count(*) AS BIGINT) AS w
             FROM pairs p
             JOIN c4 x ON x.id = p.id_a
             JOIN c4 y ON y.id = p.id_b
             GROUP BY 1, 2),
      degb AS MATERIALIZED (SELECT sv, CAST(sum(d) AS BIGINT) AS deg FROM (
                 SELECT ea AS sv,
                        CASE WHEN ea = eb THEN 2 * w ELSE w END AS d
                 FROM ce
                 UNION ALL SELECT eb, w FROM ce WHERE ea <> eb)
               GROUP BY 1),
      m2 AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM ce),
      d0 AS MATERIALIZED (SELECT DISTINCT c AS sv, c FROM c4),
${louvainMergeRoundSql("d0", "d1")},
${louvainMergeRoundSql("d1", "d2")}
      SELECT v.id AS doc_id, d2.c AS community
      FROM c4 v JOIN d2 ON d2.sv = v.c ORDER BY doc_id
    """.trim))

  /** Three-level Louvain ([[Graphs.louvainLevels]], levels = 3 — the
    * q372 recursion continued one tier: coarsen the LEVEL-2 community
    * graph by the merged labels, summing weights, and run two more
    * mutual-best merge rounds). The early-stop-on-no-shrink is
    * semantics-free (a fixpoint coarsens to an identical graph and
    * merges nothing again), so the oracle simply unrolls all three
    * levels — over the deterministic half corpus (doc_id % 2 = 0)
    * with a 2-round level 1 (the full-corpus 4-round prefix is
    * benched by q335/q372; see q373) — then the weighted
    * re-coarsening and both level-3 merge rounds on their own
    * degree/mass tables.
    */
  val q404LouvainLevels = HarnessQuery(
    "q404_louvain_levels",
    (spark, dir) => {
      // half-corpus slice (see q373): the shared pair-graph prefix is
      // benched at full scale by q335/q372; the oracle replays the slice
      val docs = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(2L)) === 0)
      val pairs = TextDedup.minhashNearDupPairs(
        docs, "text", "doc_id", hashFn = TextFunctions.fastHash)
      Graphs.louvainLevels(docs.select(col("doc_id")), "doc_id",
          pairs, rounds1 = 2, rounds2 = 2, levels = 3)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH t AS MATERIALIZED (SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, len(regexp_split_to_array(trim(lower(text)), '\\s+')) - 2),
                     i -> array_to_string((regexp_split_to_array(trim(lower(text)), '\\s+'))[i:i+2], ' ')))
                     AS sh
                 FROM documents WHERE doc_id % 2 = 0),
      pairs AS MATERIALIZED (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM t a, t b
                WHERE a.doc_id < b.doc_id
                  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
      und AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
      deg AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS k FROM und GROUP BY 1),
      m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
      c0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS c FROM documents WHERE doc_id % 2 = 0),
${louvainRoundSql("c0", "c1", 0)},
${louvainRoundSql("c1", "c2", 1)},
      ce AS MATERIALIZED (SELECT least(x.c, y.c) AS ea, greatest(x.c, y.c) AS eb,
                    CAST(count(*) AS BIGINT) AS w
             FROM pairs p
             JOIN c2 x ON x.id = p.id_a
             JOIN c2 y ON y.id = p.id_b
             GROUP BY 1, 2),
      degb AS MATERIALIZED (SELECT sv, CAST(sum(d) AS BIGINT) AS deg FROM (
                 SELECT ea AS sv,
                        CASE WHEN ea = eb THEN 2 * w ELSE w END AS d
                 FROM ce
                 UNION ALL SELECT eb, w FROM ce WHERE ea <> eb)
               GROUP BY 1),
      m2 AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM ce),
      d0 AS MATERIALIZED (SELECT DISTINCT c AS sv, c FROM c2),
${louvainMergeRoundSql("d0", "d1")},
${louvainMergeRoundSql("d1", "d2")},
      ce2 AS MATERIALIZED (SELECT least(a.c, b.c) AS ea, greatest(a.c, b.c) AS eb,
                    CAST(sum(ce.w) AS BIGINT) AS w
             FROM ce JOIN d2 a ON a.sv = ce.ea
                     JOIN d2 b ON b.sv = ce.eb
             GROUP BY 1, 2),
      degb2 AS MATERIALIZED (SELECT sv, CAST(sum(d) AS BIGINT) AS deg FROM (
                 SELECT ea AS sv,
                        CASE WHEN ea = eb THEN 2 * w ELSE w END AS d
                 FROM ce2
                 UNION ALL SELECT eb, w FROM ce2 WHERE ea <> eb)
               GROUP BY 1),
      m3 AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM ce2),
      e0 AS MATERIALIZED (SELECT DISTINCT c AS sv, c FROM d2),
${louvainMergeRoundSql("e0", "e1", ce = "ce2", degb = "degb2", m2 = "m3")},
${louvainMergeRoundSql("e1", "e2", ce = "ce2", degb = "degb2", m2 = "m3")}
      SELECT v.id AS doc_id, e2.c AS community
      FROM c2 v
      JOIN d2 ON d2.sv = v.c
      JOIN e2 ON e2.sv = d2.c
      ORDER BY doc_id
    """.trim))

  /** Incremental Louvain ([[Graphs.incrementalLouvain]] — the
    * community twin of q396's incremental connected components): the
    * near-dup pair graph (half corpus, doc_id % 2 = 0 — see q373)
    * arrives split 80/20; the 80% trains a frozen one-level
    * assignment (two parity-gated rounds), then the 20% batch
    * folds in with TWO local-move rounds where only batch-touched
    * vertices may move, scored with the exact integer gain against
    * the FULL grown graph's masses. The oracle replays both phases:
    * the round chain over the old edges, then two restricted
    * rounds with full-graph degrees and movable-set gating.
    */
  val q418IncrementalLouvain = HarnessQuery(
    "q418_incremental_louvain",
    (spark, dir) => {
      // half-corpus slice (see q373): the shared pair-graph prefix is
      // benched at full scale by q335/q372; the oracle replays the slice
      val docs = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(2L)) === 0)
      // materialize the pair graph once: it feeds multiple consumers
      // below, and uncut each would re-run the minhash near-dup join
      val pairs = graft.Materialize.cut(TextDedup.minhashNearDupPairs(
        docs, "text", "doc_id", hashFn = TextFunctions.fastHash))
      val oldPairs = pairs.filter(
        pmod(col("id_a") + col("id_b"), lit(5L)) =!= 0)
      val newPairs = pairs.filter(
        pmod(col("id_a") + col("id_b"), lit(5L)) === 0)
      val frozen = Graphs.louvainOneLevel(docs.select(col("doc_id")),
        "doc_id", oldPairs, rounds = 2)
      Graphs.incrementalLouvain(frozen, "doc_id",
          oldPairs, newPairs, rounds = 2)
        .orderBy(col("doc_id"))
    },
    Some {
      val incRound = (prev: String, nxt: String, parity: Int) => s"""
      tot_$nxt AS (SELECT a.c, CAST(sum(coalesce(d.k, 0)) AS BIGINT) AS tot
             FROM $prev a LEFT JOIN deg2 d ON d.u = a.id GROUP BY 1),
      kvc_$nxt AS (SELECT u2.u AS id, a.c AS cand,
                    CAST(count(*) AS BIGINT) AS kvc
             FROM und2 u2 JOIN mv ON mv.id = u2.u
             JOIN $prev a ON a.id = u2.v GROUP BY 1, 2),
      cand_$nxt AS (SELECT id, cand, max(kvc) AS kvc FROM (
               SELECT id, cand, kvc FROM kvc_$nxt
               UNION ALL SELECT p.id, p.c, CAST(0 AS BIGINT)
               FROM $prev p JOIN mv ON mv.id = p.id)
             GROUP BY 1, 2),
      sc_$nxt AS (SELECT cd.id, cd.cand,
               2 * m2.m * cd.kvc
                 - coalesce(dv.k, 0) * (t.tot - CASE WHEN cd.cand = cv.c
                     THEN coalesce(dv.k, 0) ELSE 0 END) AS s
             FROM cand_$nxt cd
             JOIN $prev cv ON cv.id = cd.id
             LEFT JOIN deg2 dv ON dv.u = cd.id
             JOIN tot_$nxt t ON t.c = cd.cand, m2),
      $nxt AS MATERIALIZED (SELECT cv.id,
               CASE WHEN cv.id % 2 = $parity THEN coalesce(w.cand, cv.c)
                    ELSE cv.c END AS c
             FROM $prev cv LEFT JOIN (SELECT id, cand FROM (
               SELECT id, cand, row_number() OVER (PARTITION BY id
                 ORDER BY s DESC, cand) AS r
               FROM sc_$nxt) WHERE r = 1) w ON w.id = cv.id)"""
      s"""
      WITH t AS MATERIALIZED (SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, len(regexp_split_to_array(trim(lower(text)), '\\s+')) - 2),
                     i -> array_to_string((regexp_split_to_array(trim(lower(text)), '\\s+'))[i:i+2], ' ')))
                     AS sh
                 FROM documents WHERE doc_id % 2 = 0),
      allp AS MATERIALIZED (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM t a, t b
                WHERE a.doc_id < b.doc_id
                  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
      pairs AS MATERIALIZED (SELECT * FROM allp
                WHERE (id_a + id_b) % 5 <> 0),
      newp AS MATERIALIZED (SELECT * FROM allp
                WHERE (id_a + id_b) % 5 = 0),
      und AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
      deg AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS k
              FROM und GROUP BY 1),
      m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
      c0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS c FROM documents WHERE doc_id % 2 = 0),
${louvainRoundSql("c0", "c1", 0)},
${louvainRoundSql("c1", "c2", 1)},
      und2 AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM allp
              UNION ALL SELECT id_b, id_a FROM allp),
      deg2 AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS k
              FROM und2 GROUP BY 1),
      m2 AS (SELECT CAST(count(*) AS BIGINT) AS m FROM allp),
      mv AS MATERIALIZED (SELECT DISTINCT id FROM (
              SELECT id_a AS id FROM newp
              UNION ALL SELECT id_b FROM newp)),
${incRound("c2", "i1", 0)},
${incRound("i1", "i2", 1)}
      SELECT id AS doc_id, c AS community FROM i2 ORDER BY doc_id
    """.trim
    })

  /** DBSCAN core points over the seeded 2-D projection of the
    * embedding table ([[Density.gridCorePoints]], eps = 0.1,
    * minPts = 5). The grid-blocked neighbor join is lossless over the
    * projected space, so the oracle brute-forces all-pairs distances.
    */
  val q318DbscanCore = HarnessQuery(
    "q318_dbscan_core",
    (spark, dir) =>
      Density.gridCorePoints(Tables.embeddings(spark, dir),
        "vec_id", "embedding", eps = 0.1, minPts = 5)
        .orderBy(col("vec_id")),
    Some("""
      WITH hp AS (
        SELECT h.h AS h, d.d AS d,
               (CAST(('0x' || substr(md5('42_' || h.h || '_' || d.d), 1, 15)) AS BIGINT)
                 % 1000000) / 1000000.0 - 0.5 AS v
        FROM generate_series(0, 1) h(h), generate_series(0, 63) d(d)),
      proj AS (
        SELECT e.vec_id, hp.h,
               CAST(sum(CAST(CAST(e.embedding[hp.d + 1] AS DOUBLE) * hp.v
                 AS DECIMAL(30,18))) AS DOUBLE) AS val
        FROM embeddings e, hp GROUP BY 1, 2),
      pts AS (
        SELECT vec_id,
               max(CASE WHEN h = 0 THEN val END) AS x,
               max(CASE WHEN h = 1 THEN val END) AS y
        FROM proj GROUP BY 1),
      nb AS (
        SELECT a.vec_id, count(*) AS n_neighbors
        FROM pts a JOIN pts b
          ON a.vec_id <> b.vec_id
         AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
             <= CAST(0.1 AS DOUBLE) * CAST(0.1 AS DOUBLE)
        GROUP BY 1)
      SELECT p.vec_id, floor(p.x * 1e9) / 1e9 AS x,
             floor(p.y * 1e9) / 1e9 AS y,
             COALESCE(nb.n_neighbors, 0) AS n_neighbors,
             COALESCE(nb.n_neighbors, 0) >= 5 AS is_core
      FROM pts p LEFT JOIN nb ON p.vec_id = nb.vec_id
      ORDER BY p.vec_id
    """.trim))

  /** Wald SPRT replay over the daily purchase-conversion stream
    * ([[Experiment.sprtDecision]], H0 p = 0.18 vs H1 p = 0.22,
    * alpha = beta = 0.05): cumulative LLR per day with both Wald
    * boundaries evaluated on the raw (unsnapped) trajectory.
    */
  val q319Sprt = HarnessQuery(
    "q319_sprt",
    (spark, dir) =>
      Experiment.sprtDecision(Tables.events(spark, dir), "ts",
        col("event_type") === "purchase", p0 = 0.18, p1 = 0.22)
        .orderBy(col("day")),
    Some("""
      WITH daily AS (
        SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                 AS BIGINT) AS day,
               count(*) AS n,
               CAST(sum(CASE WHEN event_type = 'purchase'
                 THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM events GROUP BY 1),
      c AS (
        SELECT day,
               CAST(sum(n) OVER w AS BIGINT) AS n_cum,
               CAST(sum(k) OVER w AS BIGINT) AS k_cum
        FROM daily WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)),
      l AS (
        SELECT day, n_cum, k_cum,
               CAST(k_cum AS DOUBLE)
                 * ln(CAST(0.22 AS DOUBLE) / CAST(0.18 AS DOUBLE))
                 + CAST(n_cum - k_cum AS DOUBLE)
                   * ln((1 - CAST(0.22 AS DOUBLE))
                     / (1 - CAST(0.18 AS DOUBLE))) AS llr
        FROM c)
      SELECT day, n_cum, k_cum, floor(llr * 1e9) / 1e9 AS llr,
             CASE WHEN llr >= ln((1 - CAST(0.05 AS DOUBLE))
                    / CAST(0.05 AS DOUBLE)) THEN 'accept_h1'
                  WHEN llr <= ln(CAST(0.05 AS DOUBLE)
                    / (1 - CAST(0.05 AS DOUBLE))) THEN 'accept_h0'
                  ELSE 'continue' END AS decision
      FROM l ORDER BY day
    """.trim))

  /** Segmented-OLS trend break over the daily event-count series
    * ([[TimeSeries.bestBreakpoint]]): the full candidate SSE curve
    * with the argmin flagged; every sufficient statistic is an exact
    * integer cumulative, replayed via the same window prefix sums.
    */
  val q320Breakpoint = HarnessQuery(
    "q320_breakpoint",
    (spark, dir) =>
      TimeSeries.bestBreakpoint(Tables.events(spark, dir), "ts")
        .orderBy(col("day")),
    Some("""
      WITH d AS (
        SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                 AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1),
      o AS (SELECT day, x,
              CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
            FROM d),
      c AS (
        SELECT day, t, x,
               CAST(sum(t) OVER w AS BIGINT) AS st,
               CAST(sum(x) OVER w AS BIGINT) AS sx,
               CAST(sum(t * t) OVER w AS BIGINT) AS stt,
               CAST(sum(t * x) OVER w AS BIGINT) AS stx,
               CAST(sum(x * x) OVER w AS BIGINT) AS sxx
        FROM o WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)),
      tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(t) AS BIGINT) AS tst,
               CAST(sum(x) AS BIGINT) AS tsx,
               CAST(sum(t * t) AS BIGINT) AS tstt,
               CAST(sum(t * x) AS BIGINT) AS tstx,
               CAST(sum(x * x) AS BIGINT) AS tsxx
        FROM o),
      cand AS (
        SELECT c.day, c.x,
               (CAST(c.sxx AS DOUBLE)
                 - CAST(c.sx AS DOUBLE) * CAST(c.sx AS DOUBLE)
                   / CAST(c.t AS DOUBLE))
               - (CAST(c.stx AS DOUBLE)
                   - CAST(c.st AS DOUBLE) * CAST(c.sx AS DOUBLE)
                     / CAST(c.t AS DOUBLE))
                 * (CAST(c.stx AS DOUBLE)
                   - CAST(c.st AS DOUBLE) * CAST(c.sx AS DOUBLE)
                     / CAST(c.t AS DOUBLE))
                 / (CAST(c.stt AS DOUBLE)
                   - CAST(c.st AS DOUBLE) * CAST(c.st AS DOUBLE)
                     / CAST(c.t AS DOUBLE)) AS sse_l,
               (CAST(tot.tsxx - c.sxx AS DOUBLE)
                 - CAST(tot.tsx - c.sx AS DOUBLE)
                   * CAST(tot.tsx - c.sx AS DOUBLE)
                   / CAST(tot.n - c.t AS DOUBLE))
               - (CAST(tot.tstx - c.stx AS DOUBLE)
                   - CAST(tot.tst - c.st AS DOUBLE)
                     * CAST(tot.tsx - c.sx AS DOUBLE)
                     / CAST(tot.n - c.t AS DOUBLE))
                 * (CAST(tot.tstx - c.stx AS DOUBLE)
                   - CAST(tot.tst - c.st AS DOUBLE)
                     * CAST(tot.tsx - c.sx AS DOUBLE)
                     / CAST(tot.n - c.t AS DOUBLE))
                 / (CAST(tot.tstt - c.stt AS DOUBLE)
                   - CAST(tot.tst - c.st AS DOUBLE)
                     * CAST(tot.tst - c.st AS DOUBLE)
                     / CAST(tot.n - c.t AS DOUBLE)) AS sse_r
        FROM c, tot WHERE c.t >= 2 AND c.t <= tot.n - 2),
      r AS (SELECT day, x, sse_l, sse_r, sse_l + sse_r AS sse_t FROM cand)
      SELECT day, x,
             floor(sse_l * 1e6) / 1e6 AS sse_left,
             floor(sse_r * 1e6) / 1e6 AS sse_right,
             floor(sse_t * 1e6) / 1e6 AS sse_total,
             row_number() OVER (ORDER BY sse_t, day) = 1 AS is_best
      FROM r ORDER BY day
    """.trim))

  /** Leave-one-source-out ridge influence
    * ([[LinAlg.ridgeLooInfluence]], groups = l_returnflag, the q314
    * fit): which source moves each coefficient, computed from ONE
    * grouped moment aggregate (never a per-group refit scan).
    */
  val q321LooInfluence = HarnessQuery(
    "q321_loo_influence",
    (spark, dir) =>
      LinAlg.ridgeLooInfluence(Tables.lineitem(spark, dir),
        "l_extendedprice", "l_quantity", "l_discount", lambda = 10.0,
        groupCol = "l_returnflag")
        .orderBy(col("grp"), col("feature")),
    Some("""
      WITH g AS (
        SELECT l_returnflag AS grp, CAST(count(*) AS BIGINT) AS gn,
               sum(CAST(l_quantity AS DECIMAL(30,10))) AS gs1,
               sum(CAST(l_discount AS DECIMAL(30,10))) AS gs2,
               sum(CAST(l_quantity * l_quantity AS DECIMAL(30,10))) AS gs11,
               sum(CAST(l_quantity * l_discount AS DECIMAL(30,10))) AS gs12,
               sum(CAST(l_discount * l_discount AS DECIMAL(30,10))) AS gs22,
               sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS gsy,
               sum(CAST(l_quantity * l_extendedprice AS DECIMAL(30,10)))
                 AS gs1y,
               sum(CAST(l_discount * l_extendedprice AS DECIMAL(30,10)))
                 AS gs2y
        FROM lineitem GROUP BY 1),
      t AS (
        SELECT CAST(sum(gn) AS BIGINT) AS tn,
               sum(gs1) AS ts1, sum(gs2) AS ts2, sum(gs11) AS ts11,
               sum(gs12) AS ts12, sum(gs22) AS ts22, sum(gsy) AS tsy,
               sum(gs1y) AS ts1y, sum(gs2y) AS ts2y
        FROM g),
      fs AS (
        SELECT CAST(tn AS DOUBLE) AS a11, CAST(ts1 AS DOUBLE) AS a12,
               CAST(ts2 AS DOUBLE) AS a13,
               CAST(ts11 AS DOUBLE) + 10.0 AS a22,
               CAST(ts12 AS DOUBLE) AS a23,
               CAST(ts22 AS DOUBLE) + 10.0 AS a33,
               CAST(tsy AS DOUBLE) AS b1, CAST(ts1y AS DOUBLE) AS b2,
               CAST(ts2y AS DOUBLE) AS b3
        FROM t),
      fsol AS (
        SELECT a11 * (a22 * a33 - a23 * a23)
                 - a12 * (a12 * a33 - a23 * a13)
                 + a13 * (a12 * a23 - a22 * a13) AS det,
               b1 * (a22 * a33 - a23 * a23)
                 - a12 * (b2 * a33 - a23 * b3)
                 + a13 * (b2 * a23 - a22 * b3) AS d0,
               a11 * (b2 * a33 - a23 * b3)
                 - b1 * (a12 * a33 - a23 * a13)
                 + a13 * (a12 * b3 - b2 * a13) AS d1,
               a11 * (a22 * b3 - b2 * a23)
                 - a12 * (a12 * b3 - b2 * a13)
                 + b1 * (a12 * a23 - a22 * a13) AS d2
        FROM fs),
      ls AS (
        SELECT grp, CAST(tn - gn AS DOUBLE) AS a11,
               CAST(ts1 - gs1 AS DOUBLE) AS a12,
               CAST(ts2 - gs2 AS DOUBLE) AS a13,
               CAST(ts11 - gs11 AS DOUBLE) + 10.0 AS a22,
               CAST(ts12 - gs12 AS DOUBLE) AS a23,
               CAST(ts22 - gs22 AS DOUBLE) + 10.0 AS a33,
               CAST(tsy - gsy AS DOUBLE) AS b1,
               CAST(ts1y - gs1y AS DOUBLE) AS b2,
               CAST(ts2y - gs2y AS DOUBLE) AS b3
        FROM g, t),
      lsol AS (
        SELECT grp,
               a11 * (a22 * a33 - a23 * a23)
                 - a12 * (a12 * a33 - a23 * a13)
                 + a13 * (a12 * a23 - a22 * a13) AS det,
               b1 * (a22 * a33 - a23 * a23)
                 - a12 * (b2 * a33 - a23 * b3)
                 + a13 * (b2 * a23 - a22 * b3) AS d0,
               a11 * (b2 * a33 - a23 * b3)
                 - b1 * (a12 * a33 - a23 * a13)
                 + a13 * (a12 * b3 - b2 * a13) AS d1,
               a11 * (a22 * b3 - b2 * a23)
                 - a12 * (a12 * b3 - b2 * a13)
                 + b1 * (a12 * a23 - a22 * a13) AS d2
        FROM ls),
      u AS (
        SELECT grp, 'intercept' AS feature,
               l.d0 / l.det AS bl, f.d0 / f.det AS bf
        FROM lsol l, fsol f
        UNION ALL
        SELECT grp, 'l_quantity', l.d1 / l.det, f.d1 / f.det
        FROM lsol l, fsol f
        UNION ALL
        SELECT grp, 'l_discount', l.d2 / l.det, f.d2 / f.det
        FROM lsol l, fsol f)
      SELECT grp, feature,
             floor(bl * 1e6) / 1e6 AS beta_loo,
             floor(bf * 1e6) / 1e6 AS beta_full,
             floor((bl - bf) * 1e6) / 1e6 AS delta
      FROM u ORDER BY grp, feature
    """.trim))

  /** IPW average treatment effect with per-arm Kish ESS
    * ([[Experiment.ipwAte]]): propensity = the q265 logistic-GD fit
    * (3 rounds, lr 0.1) of label parity on the first two embedding
    * coordinates, outcome = coordinate 4, clip 0.05. The oracle
    * unrolls the identical GD chain, scores, clips, and takes the
    * same decimal-accumulated Horvitz-Thompson sums.
    */
  val q322IpwAte = HarnessQuery(
    "q322_ipw_ate",
    (spark, dir) => {
      val e = Tables.embeddings(spark, dir)
        .withColumn("t", col("label") % 2)
        .withColumn("o", col("embedding")(3))
      Experiment.ipwAte(e,
        Seq(col("embedding")(0), col("embedding")(1)),
        "t", "o", iters = 3, lr = 0.1)
    },
    Some("""
      WITH e AS (SELECT CAST(label % 2 AS DOUBLE) AS y,
                        CAST(embedding[1] AS DOUBLE) AS x0,
                        CAST(embedding[2] AS DOUBLE) AS x1,
                        CAST(embedding[4] AS DOUBLE) AS o
                 FROM embeddings),
      g1 AS (SELECT
               sum(CAST(round(1.0/(1.0+exp(-(0.0))) - y, 12)
                        AS DECIMAL(38,12))) AS s0,
               sum(CAST(round((1.0/(1.0+exp(-(0.0))) - y) * x0, 12)
                        AS DECIMAL(38,12))) AS s1,
               sum(CAST(round((1.0/(1.0+exp(-(0.0))) - y) * x1, 12)
                        AS DECIMAL(38,12))) AS s2,
               count(*) AS n FROM e),
      w1 AS (SELECT round(0.0 - 0.1 * (CAST(s0 AS DOUBLE) / n), 12) AS b,
                    round(0.0 - 0.1 * (CAST(s1 AS DOUBLE) / n), 12) AS w0,
                    round(0.0 - 0.1 * (CAST(s2 AS DOUBLE) / n), 12) AS w1
             FROM g1),
      g2 AS (SELECT
               sum(CAST(round(1.0/(1.0+exp(-(b + w0*x0 + w1*x1))) - y, 12)
                        AS DECIMAL(38,12))) AS s0,
               sum(CAST(round((1.0/(1.0+exp(-(b + w0*x0 + w1*x1))) - y) * x0, 12)
                        AS DECIMAL(38,12))) AS s1,
               sum(CAST(round((1.0/(1.0+exp(-(b + w0*x0 + w1*x1))) - y) * x1, 12)
                        AS DECIMAL(38,12))) AS s2,
               count(*) AS n FROM e, w1),
      w2 AS (SELECT round(w1.b - 0.1 * (CAST(s0 AS DOUBLE) / n), 12) AS b,
                    round(w1.w0 - 0.1 * (CAST(s1 AS DOUBLE) / n), 12) AS w0,
                    round(w1.w1 - 0.1 * (CAST(s2 AS DOUBLE) / n), 12) AS w1
             FROM g2, w1),
      g3 AS (SELECT
               sum(CAST(round(1.0/(1.0+exp(-(b + w0*x0 + w1*x1))) - y, 12)
                        AS DECIMAL(38,12))) AS s0,
               sum(CAST(round((1.0/(1.0+exp(-(b + w0*x0 + w1*x1))) - y) * x0, 12)
                        AS DECIMAL(38,12))) AS s1,
               sum(CAST(round((1.0/(1.0+exp(-(b + w0*x0 + w1*x1))) - y) * x1, 12)
                        AS DECIMAL(38,12))) AS s2,
               count(*) AS n FROM e, w2),
      w3 AS (SELECT round(w2.b - 0.1 * (CAST(s0 AS DOUBLE) / n), 12) AS b,
                    round(w2.w0 - 0.1 * (CAST(s1 AS DOUBLE) / n), 12) AS w0,
                    round(w2.w1 - 0.1 * (CAST(s2 AS DOUBLE) / n), 12) AS w1
             FROM g3, w2),
      sc AS (SELECT e.y AS t, e.o,
                    least(greatest(1.0/(1.0+exp(-(b + w0*x0 + w1*x1))),
                                   CAST(0.05 AS DOUBLE)),
                          1 - CAST(0.05 AS DOUBLE)) AS p
             FROM e, w3),
      s AS (SELECT count(*) AS n,
                   sum(CAST(round(t * o / p - (1 - t) * o / (1 - p), 12)
                     AS DECIMAL(38,12))) AS st,
                   sum(CAST(CASE WHEN t = 1.0 THEN round(1.0 / p, 12)
                     ELSE 0 END AS DECIMAL(38,12))) AS swt,
                   sum(CAST(CASE WHEN t = 1.0
                     THEN round((1.0 / p) * (1.0 / p), 12)
                     ELSE 0 END AS DECIMAL(38,12))) AS swt2,
                   sum(CAST(CASE WHEN t = 0.0 THEN round(1.0 / (1 - p), 12)
                     ELSE 0 END AS DECIMAL(38,12))) AS swc,
                   sum(CAST(CASE WHEN t = 0.0
                     THEN round((1.0 / (1 - p)) * (1.0 / (1 - p)), 12)
                     ELSE 0 END AS DECIMAL(38,12))) AS swc2
            FROM sc)
      SELECT n,
             floor(CAST(st AS DOUBLE) / CAST(n AS DOUBLE) * 1e9) / 1e9
               AS ate_ipw,
             floor(CAST(swt AS DOUBLE) * CAST(swt AS DOUBLE)
               / CAST(swt2 AS DOUBLE) * 1e6) / 1e6 AS ess_treated,
             floor(CAST(swc AS DOUBLE) * CAST(swc AS DOUBLE)
               / CAST(swc2 AS DOUBLE) * 1e6) / 1e6 AS ess_control
      FROM s
    """.trim))

  /** Ridge regularization path ([[LinAlg.ridgePath]], five lambdas
    * from 0 to 1e6): the whole sweep from one ten-moment aggregate —
    * SSE rises and the slope norm falls monotonically along the path.
    */
  val q323RidgePath = HarnessQuery(
    "q323_ridge_path",
    (spark, dir) =>
      LinAlg.ridgePath(Tables.lineitem(spark, dir),
        "l_extendedprice", "l_quantity", "l_discount",
        Seq(0.0, 1.0, 100.0, 10000.0, 1000000.0))
        .orderBy(col("lambda")),
    Some("""
      WITH m AS (
        SELECT
          CAST(count(*) AS DOUBLE) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) AS s1,
          CAST(sum(CAST(l_discount AS DECIMAL(30,10))) AS DOUBLE) AS s2,
          CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(30,10)))
            AS DOUBLE) AS s11,
          CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(30,10)))
            AS DOUBLE) AS s12,
          CAST(sum(CAST(l_discount * l_discount AS DECIMAL(30,10)))
            AS DOUBLE) AS s22,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) AS sy,
          CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(30,10)))
            AS DOUBLE) AS s1y,
          CAST(sum(CAST(l_discount * l_extendedprice AS DECIMAL(30,10)))
            AS DOUBLE) AS s2y,
          CAST(sum(CAST(l_extendedprice * l_extendedprice
            AS DECIMAL(30,10))) AS DOUBLE) AS syy
        FROM lineitem),
      lam AS (SELECT CAST(v AS DOUBLE) AS lambda
              FROM (VALUES (0), (1), (100), (10000), (1000000)) l(v)),
      sys AS (
        SELECT lambda, syy, s11, s22,
               n AS a11, s1 AS a12, s2 AS a13,
               s11 + lambda AS a22, s12 AS a23, s22 + lambda AS a33,
               sy AS b1, s1y AS b2, s2y AS b3
        FROM m, lam),
      sol AS (
        SELECT lambda, syy, s11, s22, a11, a12, a13, a22, a23, a33,
               b1, b2, b3,
               a11 * (a22 * a33 - a23 * a23)
                 - a12 * (a12 * a33 - a23 * a13)
                 + a13 * (a12 * a23 - a22 * a13) AS det,
               b1 * (a22 * a33 - a23 * a23)
                 - a12 * (b2 * a33 - a23 * b3)
                 + a13 * (b2 * a23 - a22 * b3) AS d0,
               a11 * (b2 * a33 - a23 * b3)
                 - b1 * (a12 * a33 - a23 * a13)
                 + a13 * (a12 * b3 - b2 * a13) AS d1,
               a11 * (a22 * b3 - b2 * a23)
                 - a12 * (a12 * b3 - b2 * a13)
                 + b1 * (a12 * a23 - a22 * a13) AS d2
        FROM sys),
      beta AS (
        SELECT lambda, syy, s11, s22, a11, a12, a13, a23, b1, b2, b3,
               floor((d0 / det) * 1e6) / 1e6 AS b0,
               floor((d1 / det) * 1e6) / 1e6 AS bx1,
               floor((d2 / det) * 1e6) / 1e6 AS bx2
        FROM sol)
      SELECT lambda,
             b0 AS beta_intercept,
             bx1 AS beta_x1,
             bx2 AS beta_x2,
             floor((syy
               - 2.0 * (b0 * b1 + bx1 * b2 + bx2 * b3)
               + (b0 * b0 * a11
                 + bx1 * bx1 * s11
                 + bx2 * bx2 * s22
                 + 2.0 * b0 * bx1 * a12
                 + 2.0 * b0 * bx2 * a13
                 + 2.0 * bx1 * bx2 * a23)) * 1e2) / 1e2 AS sse,
             floor((bx1 * bx1 + bx2 * bx2) * 1e4) / 1e4 AS slope_l2
      FROM beta ORDER BY lambda
    """.trim))

  /** Trailing-7-day distinct users per day via HLL pane merge
    * ([[Sketches.hllSlidingDistinct]]): one register table per day,
    * window merged register-wise — the streaming distinct shape —
    * with the exact trailing distinct as the audit column.
    */
  val q324HllSliding = HarnessQuery(
    "q324_hll_sliding",
    (spark, dir) =>
      Sketches.hllSlidingDistinct(Tables.events(spark, dir),
        "ts", "user_id", windowDays = 7)
        .orderBy(col("day")),
    Some("""
      WITH ev AS (
        SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                 AS BIGINT) AS day,
               CAST(user_id AS VARCHAR) AS item
        FROM events),
      h AS (SELECT day,
              CAST(('0x' || substr(md5(item), 1, 15)) AS BIGINT) AS h
            FROM ev),
      b AS (SELECT day, h % 64 AS b, h // 64 AS w FROM h),
      r AS (SELECT day, b,
              CAST(max(CASE WHEN w = 0 THEN 54
                ELSE 55 - length(bin(w)) END) AS INT) AS m
            FROM b GROUP BY 1, 2),
      days AS (SELECT DISTINCT day FROM ev),
      grid AS (SELECT d.day, g.b FROM days d, generate_series(0, 63) g(b)),
      mg AS (
        SELECT grid.day, grid.b,
               max(r.m) OVER (PARTITION BY grid.b ORDER BY grid.day
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS mm
        FROM grid LEFT JOIN r ON r.day = grid.day AND r.b = grid.b),
      agg AS (
        SELECT day, CAST(count(*) AS INT) AS used_registers,
               CAST(sum(CAST(1 AS BIGINT) << (54 - mm)) AS BIGINT) AS s0
        FROM mg WHERE mm IS NOT NULL GROUP BY 1),
      est AS (
        SELECT day, used_registers, 64 - used_registers AS zr,
               (CAST(0.709 AS DOUBLE) * 64 * 64 * 18014398509481984.0)
                 / CAST(s0 + CAST(64 - used_registers AS BIGINT)
                     * 18014398509481984 AS DOUBLE) AS raw
        FROM agg),
      fin AS (
        SELECT day, used_registers,
               CASE WHEN raw <= 160.0 AND zr > 0
                    THEN 64.0 * ln(64.0 / zr) ELSE raw END AS e
        FROM est),
      di AS (SELECT DISTINCT day AS d, item FROM ev),
      ex AS (
        SELECT days.day, count(DISTINCT di.item) AS exact
        FROM days JOIN di ON di.d >= days.day - 6 AND di.d <= days.day
        GROUP BY 1)
      SELECT fin.day, used_registers,
             floor(e * 1e6) / 1e6 AS est, exact,
             floor(abs(e - exact) / exact * 1e6) / 1e6 AS rel_err
      FROM fin JOIN ex ON fin.day = ex.day
      ORDER BY fin.day
    """.trim))

  /** Stratified systematic PPS sample ([[Resample.systematicPps]],
    * 50 draws per order priority, weight = o_totalprice): copies per
    * kept order from the deterministic half-step grid over the exact
    * decimal cumulative-weight axis.
    */
  val q325PpsSample = HarnessQuery(
    "q325_pps_sample",
    (spark, dir) =>
      Resample.systematicPps(Tables.orders(spark, dir),
        "o_orderpriority", "o_orderkey", "o_totalprice",
        nPerStratum = 50)
        .orderBy(col("o_orderpriority"), col("o_orderkey")),
    Some("""
      WITH base AS (
        SELECT o_orderpriority AS stratum, o_orderkey AS id,
               CAST(o_totalprice AS DOUBLE) AS weight
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_totalprice > 0),
      c AS (
        SELECT stratum, id, weight,
               sum(CAST(weight AS DECIMAL(30,6))) OVER
                 (PARTITION BY stratum ORDER BY id
                  ROWS UNBOUNDED PRECEDING) AS cw
        FROM base),
      t AS (
        SELECT stratum, sum(CAST(weight AS DECIMAL(30,6))) AS tw
        FROM base GROUP BY 1),
      j AS (
        SELECT c.stratum, c.id, c.weight,
               least(floor(CAST(c.cw AS DOUBLE)
                 / (CAST(t.tw AS DOUBLE) / 50.0) + 0.5), 50) AS hi,
               least(floor(CAST(c.cw - CAST(c.weight AS DECIMAL(30,6))
                   AS DOUBLE)
                 / (CAST(t.tw AS DOUBLE) / 50.0) + 0.5), 50) AS lo
        FROM c JOIN t USING (stratum))
      SELECT stratum AS o_orderpriority, id AS o_orderkey, weight,
             CAST(hi - lo AS BIGINT) AS copies
      FROM j WHERE hi - lo >= 1
      ORDER BY o_orderpriority, o_orderkey
    """.trim))

  /** Doubly-robust AIPW treatment effect ([[Experiment.aipwAte]]):
    * q322's clipped logistic propensity augmented with per-arm
    * closed-form OLS outcome models (snapped betas; zero extra data
    * passes). Completes the causal family: matching (q303),
    * stratification (q255), weighting (q322), augmentation (here).
    */
  val q326AipwAte = HarnessQuery(
    "q326_aipw_ate",
    (spark, dir) => {
      val e = Tables.embeddings(spark, dir)
        .withColumn("t", col("label") % 2)
        .withColumn("o", col("embedding")(3))
      Experiment.aipwAte(e,
        Seq(col("embedding")(0), col("embedding")(1)),
        "t", "o", iters = 3, lr = 0.1)
    },
    Some("""
      WITH e AS (SELECT CAST(label % 2 AS DOUBLE) AS y,
                        CAST(embedding[1] AS DOUBLE) AS x0,
                        CAST(embedding[2] AS DOUBLE) AS x1,
                        CAST(embedding[4] AS DOUBLE) AS o
                 FROM embeddings),
      g1 AS (SELECT
               sum(CAST(round(1.0/(1.0+exp(-(0.0))) - y, 12)
                        AS DECIMAL(38,12))) AS s0,
               sum(CAST(round((1.0/(1.0+exp(-(0.0))) - y) * x0, 12)
                        AS DECIMAL(38,12))) AS s1,
               sum(CAST(round((1.0/(1.0+exp(-(0.0))) - y) * x1, 12)
                        AS DECIMAL(38,12))) AS s2,
               count(*) AS n FROM e),
      w1 AS (SELECT round(0.0 - 0.1 * (CAST(s0 AS DOUBLE) / n), 12) AS b,
                    round(0.0 - 0.1 * (CAST(s1 AS DOUBLE) / n), 12) AS w0,
                    round(0.0 - 0.1 * (CAST(s2 AS DOUBLE) / n), 12) AS w1
             FROM g1),
      g2 AS (SELECT
               sum(CAST(round(1.0/(1.0+exp(-(b + w0*x0 + w1*x1))) - y, 12)
                        AS DECIMAL(38,12))) AS s0,
               sum(CAST(round((1.0/(1.0+exp(-(b + w0*x0 + w1*x1))) - y) * x0, 12)
                        AS DECIMAL(38,12))) AS s1,
               sum(CAST(round((1.0/(1.0+exp(-(b + w0*x0 + w1*x1))) - y) * x1, 12)
                        AS DECIMAL(38,12))) AS s2,
               count(*) AS n FROM e, w1),
      w2 AS (SELECT round(w1.b - 0.1 * (CAST(s0 AS DOUBLE) / n), 12) AS b,
                    round(w1.w0 - 0.1 * (CAST(s1 AS DOUBLE) / n), 12) AS w0,
                    round(w1.w1 - 0.1 * (CAST(s2 AS DOUBLE) / n), 12) AS w1
             FROM g2, w1),
      g3 AS (SELECT
               sum(CAST(round(1.0/(1.0+exp(-(b + w0*x0 + w1*x1))) - y, 12)
                        AS DECIMAL(38,12))) AS s0,
               sum(CAST(round((1.0/(1.0+exp(-(b + w0*x0 + w1*x1))) - y) * x0, 12)
                        AS DECIMAL(38,12))) AS s1,
               sum(CAST(round((1.0/(1.0+exp(-(b + w0*x0 + w1*x1))) - y) * x1, 12)
                        AS DECIMAL(38,12))) AS s2,
               count(*) AS n FROM e, w2),
      w3 AS (SELECT round(w2.b - 0.1 * (CAST(s0 AS DOUBLE) / n), 12) AS b,
                    round(w2.w0 - 0.1 * (CAST(s1 AS DOUBLE) / n), 12) AS w0,
                    round(w2.w1 - 0.1 * (CAST(s2 AS DOUBLE) / n), 12) AS w1
             FROM g3, w2),
      am AS (SELECT
               CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS t_n,
               sum(CAST(CASE WHEN y = 1.0 THEN x0 ELSE 0 END
                 AS DECIMAL(30,10))) AS t_s1,
               sum(CAST(CASE WHEN y = 1.0 THEN x1 ELSE 0 END
                 AS DECIMAL(30,10))) AS t_s2,
               sum(CAST(CASE WHEN y = 1.0 THEN x0 * x0 ELSE 0 END
                 AS DECIMAL(30,10))) AS t_s11,
               sum(CAST(CASE WHEN y = 1.0 THEN x0 * x1 ELSE 0 END
                 AS DECIMAL(30,10))) AS t_s12,
               sum(CAST(CASE WHEN y = 1.0 THEN x1 * x1 ELSE 0 END
                 AS DECIMAL(30,10))) AS t_s22,
               sum(CAST(CASE WHEN y = 1.0 THEN o ELSE 0 END
                 AS DECIMAL(30,10))) AS t_sy,
               sum(CAST(CASE WHEN y = 1.0 THEN x0 * o ELSE 0 END
                 AS DECIMAL(30,10))) AS t_s1y,
               sum(CAST(CASE WHEN y = 1.0 THEN x1 * o ELSE 0 END
                 AS DECIMAL(30,10))) AS t_s2y,
               CAST(sum(CASE WHEN y = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS c_n,
               sum(CAST(CASE WHEN y = 0.0 THEN x0 ELSE 0 END
                 AS DECIMAL(30,10))) AS c_s1,
               sum(CAST(CASE WHEN y = 0.0 THEN x1 ELSE 0 END
                 AS DECIMAL(30,10))) AS c_s2,
               sum(CAST(CASE WHEN y = 0.0 THEN x0 * x0 ELSE 0 END
                 AS DECIMAL(30,10))) AS c_s11,
               sum(CAST(CASE WHEN y = 0.0 THEN x0 * x1 ELSE 0 END
                 AS DECIMAL(30,10))) AS c_s12,
               sum(CAST(CASE WHEN y = 0.0 THEN x1 * x1 ELSE 0 END
                 AS DECIMAL(30,10))) AS c_s22,
               sum(CAST(CASE WHEN y = 0.0 THEN o ELSE 0 END
                 AS DECIMAL(30,10))) AS c_sy,
               sum(CAST(CASE WHEN y = 0.0 THEN x0 * o ELSE 0 END
                 AS DECIMAL(30,10))) AS c_s1y,
               sum(CAST(CASE WHEN y = 0.0 THEN x1 * o ELSE 0 END
                 AS DECIMAL(30,10))) AS c_s2y
             FROM e),
      tsys AS (SELECT CAST(t_n AS DOUBLE) AS a11,
                      CAST(t_s1 AS DOUBLE) AS a12,
                      CAST(t_s2 AS DOUBLE) AS a13,
                      CAST(t_s11 AS DOUBLE) AS a22,
                      CAST(t_s12 AS DOUBLE) AS a23,
                      CAST(t_s22 AS DOUBLE) AS a33,
                      CAST(t_sy AS DOUBLE) AS b1,
                      CAST(t_s1y AS DOUBLE) AS b2,
                      CAST(t_s2y AS DOUBLE) AS b3
               FROM am),
      csys AS (SELECT CAST(c_n AS DOUBLE) AS a11,
                      CAST(c_s1 AS DOUBLE) AS a12,
                      CAST(c_s2 AS DOUBLE) AS a13,
                      CAST(c_s11 AS DOUBLE) AS a22,
                      CAST(c_s12 AS DOUBLE) AS a23,
                      CAST(c_s22 AS DOUBLE) AS a33,
                      CAST(c_sy AS DOUBLE) AS b1,
                      CAST(c_s1y AS DOUBLE) AS b2,
                      CAST(c_s2y AS DOUBLE) AS b3
               FROM am),
      tsol AS (SELECT a11 * (a22 * a33 - a23 * a23)
                        - a12 * (a12 * a33 - a23 * a13)
                        + a13 * (a12 * a23 - a22 * a13) AS det,
                      b1 * (a22 * a33 - a23 * a23)
                        - a12 * (b2 * a33 - a23 * b3)
                        + a13 * (b2 * a23 - a22 * b3) AS d0,
                      a11 * (b2 * a33 - a23 * b3)
                        - b1 * (a12 * a33 - a23 * a13)
                        + a13 * (a12 * b3 - b2 * a13) AS d1,
                      a11 * (a22 * b3 - b2 * a23)
                        - a12 * (a12 * b3 - b2 * a13)
                        + b1 * (a12 * a23 - a22 * a13) AS d2
               FROM tsys),
      csol AS (SELECT a11 * (a22 * a33 - a23 * a23)
                        - a12 * (a12 * a33 - a23 * a13)
                        + a13 * (a12 * a23 - a22 * a13) AS det,
                      b1 * (a22 * a33 - a23 * a23)
                        - a12 * (b2 * a33 - a23 * b3)
                        + a13 * (b2 * a23 - a22 * b3) AS d0,
                      a11 * (b2 * a33 - a23 * b3)
                        - b1 * (a12 * a33 - a23 * a13)
                        + a13 * (a12 * b3 - b2 * a13) AS d1,
                      a11 * (a22 * b3 - b2 * a23)
                        - a12 * (a12 * b3 - b2 * a13)
                        + b1 * (a12 * a23 - a22 * a13) AS d2
               FROM csys),
      tb AS (SELECT floor(d0 / det * 1e9) / 1e9 AS b0,
                    floor(d1 / det * 1e9) / 1e9 AS b1,
                    floor(d2 / det * 1e9) / 1e9 AS b2
             FROM tsol),
      cb AS (SELECT floor(d0 / det * 1e9) / 1e9 AS b0,
                    floor(d1 / det * 1e9) / 1e9 AS b1,
                    floor(d2 / det * 1e9) / 1e9 AS b2
             FROM csol),
      sc AS (SELECT e.y AS t, e.o, e.x0, e.x1,
                    least(greatest(1.0/(1.0+exp(-(w3.b + w3.w0*e.x0
                        + w3.w1*e.x1))),
                                   CAST(0.05 AS DOUBLE)),
                          1 - CAST(0.05 AS DOUBLE)) AS p,
                    tb.b0 + tb.b1 * e.x0 + tb.b2 * e.x1 AS m1,
                    cb.b0 + cb.b1 * e.x0 + cb.b2 * e.x1 AS m0
             FROM e, w3, tb, cb),
      s AS (SELECT count(*) AS n,
                   sum(CAST(round(m1 - m0 + t * (o - m1) / p
                     - (1 - t) * (o - m0) / (1 - p), 12)
                     AS DECIMAL(38,12))) AS sa,
                   sum(CAST(round(m1, 12) AS DECIMAL(38,12))) AS sm1,
                   sum(CAST(round(m0, 12) AS DECIMAL(38,12))) AS sm0
            FROM sc)
      SELECT n,
             floor(CAST(sa AS DOUBLE) / CAST(n AS DOUBLE) * 1e9) / 1e9
               AS ate_aipw,
             floor(CAST(sm1 AS DOUBLE) / CAST(n AS DOUBLE) * 1e9) / 1e9
               AS mt_mean,
             floor(CAST(sm0 AS DOUBLE) / CAST(n AS DOUBLE) * 1e9) / 1e9
               AS mc_mean
      FROM s
    """.trim))

  /** Seeded rerandomization test ([[Experiment.permutationTest]],
    * B = 199): does purchase value differ from non-purchase value?
    * The B replicates explode in-row — no label shuffle, one partial
    * aggregate keyed by (replicate, arm).
    */
  val q327Permutation = HarnessQuery(
    "q327_permutation",
    (spark, dir) =>
      Experiment.permutationTest(Tables.events(spark, dir),
        "event_id", "value", col("event_type") === "purchase",
        reps = 199),
    Some("""
      WITH base AS (
        SELECT CAST(event_id AS VARCHAR) AS id,
               CAST("value" AS DOUBLE) AS v,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS t
        FROM events),
      obs AS (
        SELECT CAST(sum(CAST(CASE WHEN t = 1 THEN v ELSE 0 END
                 AS DECIMAL(30,6))) AS DOUBLE)
                 / CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               - CAST(sum(CAST(CASE WHEN t = 0 THEN v ELSE 0 END
                 AS DECIMAL(30,6))) AS DOUBLE)
                 / CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 AS o
        FROM base),
      perm AS (
        SELECT g.b AS b,
               CAST(('0x' || substr(md5(base.id || '_' || g.b), 1, 15))
                 AS BIGINT) % 2 AS arm,
               base.v
        FROM base, generate_series(0, 198) g(b)),
      pd AS (
        SELECT b,
               CAST(sum(CAST(CASE WHEN arm = 1 THEN v ELSE 0 END
                 AS DECIMAL(30,6))) AS DOUBLE)
                 / CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               - CAST(sum(CAST(CASE WHEN arm = 0 THEN v ELSE 0 END
                 AS DECIMAL(30,6))) AS DOUBLE)
                 / CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 AS diff
        FROM perm GROUP BY 1)
      SELECT count(*) AS b_reps,
             floor((SELECT o FROM obs) * 1e9) / 1e9 AS observed_diff,
             CAST(sum(CASE WHEN abs(diff) >= abs((SELECT o FROM obs))
               THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
             CAST(1 + sum(CASE WHEN abs(diff) >= abs((SELECT o FROM obs))
               THEN 1 ELSE 0 END) AS DOUBLE) / CAST(200 AS DOUBLE)
               AS p_value
      FROM pd
    """.trim))

  /** CMH pooled odds ratio ([[Experiment.cmhOddsRatio]]): purchase ×
    * high-value association stratified by day-of-week — the
    * confounder-adjusted 2x2 family member beside chi-square (q191).
    */
  val q328Cmh = HarnessQuery(
    "q328_cmh",
    (spark, dir) => {
      val us = unix_micros(col("ts"))
      val day = ((us - pmod(us, lit(86400000000L)))
        / lit(86400000000L)).cast("long")
      Experiment.cmhOddsRatio(Tables.events(spark, dir),
        pmod(day, lit(7L)),
        col("event_type") === "purchase",
        col("value") > 35.0)
    },
    Some("""
      WITH e AS (
        SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                 AS BIGINT) % 7 AS s,
               event_type = 'purchase' AS x,
               "value" > 35.0 AS y
        FROM events),
      cells AS (
        SELECT s,
               CAST(sum(CASE WHEN x AND y THEN 1 ELSE 0 END) AS BIGINT)
                 AS a,
               CAST(sum(CASE WHEN x AND NOT y THEN 1 ELSE 0 END)
                 AS BIGINT) AS b,
               CAST(sum(CASE WHEN NOT x AND y THEN 1 ELSE 0 END)
                 AS BIGINT) AS c,
               CAST(sum(CASE WHEN NOT x AND NOT y THEN 1 ELSE 0 END)
                 AS BIGINT) AS d
        FROM e GROUP BY 1),
      terms AS (
        SELECT round(CAST(a * d AS DOUBLE)
                 / CAST(a + b + c + d AS DOUBLE), 12) AS ad,
               round(CAST(b * c AS DOUBLE)
                 / CAST(a + b + c + d AS DOUBLE), 12) AS bc
        FROM cells),
      s AS (SELECT count(*) AS k_strata,
                   sum(CAST(ad AS DECIMAL(38,12))) AS sad,
                   sum(CAST(bc AS DECIMAL(38,12))) AS sbc
            FROM terms)
      SELECT k_strata, CAST(sad AS DOUBLE) AS sum_ad,
             CAST(sbc AS DOUBLE) AS sum_bc,
             floor(CAST(sad AS DOUBLE) / CAST(sbc AS DOUBLE) * 1e9) / 1e9
               AS or_cmh
      FROM s
    """.trim))

  /** Wilcoxon signed-rank ([[RankStats.wilcoxonSignedRank]]) on each
    * user's first-half vs second-half mean event value (the paired
    * pre/post design; the calendar split day 19738 = 2024-01-16 is
    * pinned by the testdata contract). Tie-corrected normal z.
    */
  val q329Wilcoxon = HarnessQuery(
    "q329_wilcoxon",
    (spark, dir) => {
      val us = unix_micros(col("ts"))
      val day = ((us - pmod(us, lit(86400000000L)))
        / lit(86400000000L)).cast("long")
      val pairs = Tables.events(spark, dir)
        .select(col("user_id"), day.as("d"), col("value"))
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("d") < 19738L,
            col("value").cast("decimal(30,6)"))).as("sPre"),
          sum(when(col("d") < 19738L, 1L).otherwise(0L)).as("nPre"),
          sum(when(col("d") >= 19738L,
            col("value").cast("decimal(30,6)"))).as("sPost"),
          sum(when(col("d") >= 19738L, 1L).otherwise(0L)).as("nPost"))
        .filter(col("nPre") > 0 && col("nPost") > 0)
        .select((col("sPost").cast("double") / col("nPost").cast("double")
          - col("sPre").cast("double") / col("nPre").cast("double"))
          .as("diff"))
      RankStats.wilcoxonSignedRank(pairs, "diff")
    },
    Some("""
      WITH per AS (
        SELECT user_id,
               sum(CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                 < 19738 THEN CAST("value" AS DECIMAL(30,6)) END) AS spre,
               sum(CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                 < 19738 THEN 1 ELSE 0 END) AS npre,
               sum(CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                 >= 19738 THEN CAST("value" AS DECIMAL(30,6)) END) AS spost,
               sum(CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                 >= 19738 THEN 1 ELSE 0 END) AS npost
        FROM events GROUP BY 1),
      base AS (
        SELECT CAST(spost AS DOUBLE) / CAST(npost AS DOUBLE)
                 - CAST(spre AS DOUBLE) / CAST(npre AS DOUBLE) AS d
        FROM per WHERE npre > 0 AND npost > 0),
      nz AS (SELECT d, abs(d) AS ad FROM base
             WHERE d IS NOT NULL AND d <> 0),
      rk AS (
        SELECT d, ad, rank() OVER (ORDER BY ad) AS rmin,
               count(*) OVER (PARTITION BY ad) AS c
        FROM nz),
      a AS (
        SELECT count(*) AS n,
               sum(CASE WHEN d > 0
                 THEN CAST(CAST(rmin AS DOUBLE)
                   + CAST(c - 1 AS DOUBLE) / 2.0 AS DECIMAL(20,1))
                 ELSE CAST(0.0 AS DECIMAL(20,1)) END) AS wp
        FROM rk),
      t AS (
        SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tcorr
        FROM (SELECT count(*) AS t FROM nz GROUP BY ad) u)
      SELECT n AS n_pairs, CAST(wp AS DOUBLE) AS w_plus,
             floor((CAST(wp AS DOUBLE)
               - CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE) / 4.0)
               / sqrt(CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)
                   * CAST(2 * n + 1 AS DOUBLE) / 24.0
                 - CAST(tcorr AS DOUBLE) / 48.0) * 1e9) / 1e9 AS z
      FROM a, t
    """.trim))

  /** Cohen's kappa ([[RankStats.cohensKappa]]) between two threshold
    * "annotators" of event value (35 vs 30) — the chance-corrected
    * agreement audit for double-labeled data.
    */
  val q330Kappa = HarnessQuery(
    "q330_kappa",
    (spark, dir) =>
      RankStats.cohensKappa(Tables.events(spark, dir),
        col("value") > 35.0, col("value") > 30.0),
    Some("""
      WITH c AS (
        SELECT
          CAST(sum(CASE WHEN "value" > 35.0 AND "value" > 30.0
            THEN 1 ELSE 0 END) AS BIGINT) AS a,
          CAST(sum(CASE WHEN "value" > 35.0 AND NOT ("value" > 30.0)
            THEN 1 ELSE 0 END) AS BIGINT) AS b,
          CAST(sum(CASE WHEN NOT ("value" > 35.0) AND "value" > 30.0
            THEN 1 ELSE 0 END) AS BIGINT) AS c,
          CAST(sum(CASE WHEN NOT ("value" > 35.0)
              AND NOT ("value" > 30.0)
            THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM events),
      k AS (
        SELECT a + b + c + d AS n,
               CAST(a + d AS DOUBLE) / CAST(a + b + c + d AS DOUBLE) AS po,
               (CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
                 + CAST(c + d AS DOUBLE) * CAST(b + d AS DOUBLE))
                 / (CAST(a + b + c + d AS DOUBLE)
                   * CAST(a + b + c + d AS DOUBLE)) AS pe
        FROM c)
      SELECT n, floor(po * 1e9) / 1e9 AS po,
             floor(pe * 1e9) / 1e9 AS pe,
             floor((po - pe) / (1.0 - pe) * 1e9) / 1e9 AS kappa
      FROM k
    """.trim))

  /** Lorenz curve of l_extendedprice at decile boundaries
    * ([[graft.operators.Inequality.lorenzCurve]]) — the distribution
    * behind the q243 Gini scalar, selected by exact integer
    * crossings over the bounded distinct-value domain.
    */
  val q331Lorenz = HarnessQuery(
    "q331_lorenz",
    (spark, dir) =>
      graft.operators.Inequality.lorenzCurve(
        Tables.lineitem(spark, dir), "l_extendedprice", deciles = 10)
        .orderBy(col("decile")),
    Some("""
      WITH per AS (
        SELECT CAST(l_extendedprice AS DECIMAL(18,6)) AS v,
               count(*) AS c
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_extendedprice >= 0
        GROUP BY 1),
      cum AS (
        SELECT v, c,
               CAST(sum(c) OVER w AS BIGINT) AS cl,
               CAST(sum(v * CAST(c AS DECIMAL(18,0))) OVER w
                 AS DECIMAL(28,6)) AS sv
        FROM per WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
      tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(v * CAST(c AS DECIMAL(18,0))) AS DECIMAL(28,6))
                 AS s
        FROM per),
      sel AS (
        SELECT g.d AS d, min(cum.cl) AS cl
        FROM cum, tot, generate_series(1, 10) g(d)
        WHERE cum.cl * 10 >= g.d * tot.n
        GROUP BY 1)
      SELECT CAST(sel.d AS INT) AS decile,
             floor(CAST(sel.cl AS DOUBLE) / CAST(tot.n AS DOUBLE) * 1e9)
               / 1e9 AS pop_share,
             floor(CAST(cum.sv AS DOUBLE) / CAST(tot.s AS DOUBLE) * 1e9)
               / 1e9 AS value_share
      FROM sel JOIN cum ON sel.cl = cum.cl, tot
      ORDER BY decile
    """.trim))

  /** Revenue concentration per market segment
    * ([[graft.operators.Inequality.herfindahl]]): HHI of customer
    * order totals within each c_mktsegment — Σx²/X², no per-member
    * share materialization.
    */
  val q332Hhi = HarnessQuery(
    "q332_hhi",
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
      val c = Tables.customer(spark, dir)
      graft.operators.Inequality.herfindahl(
        o.join(c, o("o_custkey") === c("c_custkey"))
          .select(col("c_mktsegment"), col("o_custkey"),
            col("o_totalprice")),
        "c_mktsegment", "o_custkey", "o_totalprice")
    },
    Some("""
      WITH member AS (
        SELECT c.c_mktsegment AS m, o.o_custkey AS i,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6)))
                 AS DECIMAL(28,6)) AS x
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_totalprice IS NOT NULL
        GROUP BY 1, 2),
      mk AS (
        SELECT m, count(*) AS n_members,
               CAST(sum(x) AS DECIMAL(28,6)) AS s,
               sum(CAST(CAST(x AS DECIMAL(19,6))
                 * CAST(x AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS sq
        FROM member GROUP BY 1)
      SELECT m AS c_mktsegment, n_members,
             CAST(s AS DOUBLE) AS total,
             floor(CAST(sq AS DOUBLE)
               / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) * 1e9) / 1e9
               AS hhi
      FROM mk ORDER BY c_mktsegment
    """.trim))

  /** Deterministic hash-seeded random walks ([[Graphs.hashWalks]],
    * the derandomized DeepWalk corpus generator) over the event-type
    * transition graph (consecutive events per user, self-loops
    * dropped): 3 walks per node, 5 steps, every hop the md5-argmin
    * out-neighbor — the whole tape unrolls step by step in SQL.
    */
  val q343HashWalks = HarnessQuery(
    "q343_hash_walks",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val edges = ev.withColumn("__next", lead(col("event_type"), 1).over(w))
        .filter(col("__next").isNotNull && col("__next") =!= col("event_type"))
        .select(col("event_type").as("src"), col("__next").as("dst"))
      Graphs.hashWalks(edges, "src", "dst", walksPerNode = 3, steps = 5)
        .orderBy(col("start"), col("walk_id"), col("step"))
    },
    Some {
      val step = (t: Int) => s"""
      s$t AS (SELECT start, walk_id, CAST($t AS BIGINT) AS step, dst AS node FROM (
               SELECT c.start, c.walk_id, e.dst,
                      row_number() OVER (PARTITION BY c.start, c.walk_id
                        ORDER BY CAST(('0x' || substr(md5(concat_ws(':', c.start, c.walk_id, $t, c.node, e.dst)), 1, 15)) AS BIGINT),
                                 e.dst) AS rk
               FROM s${t - 1} c JOIN e ON c.node = e.src) z WHERE rk = 1),"""
      s"""
      WITH ev AS (SELECT event_type,
                    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
                  FROM events),
      e AS (SELECT DISTINCT event_type AS src, nxt AS dst FROM ev
            WHERE nxt IS NOT NULL AND nxt <> event_type),
      nodes AS (SELECT src AS n FROM e UNION SELECT dst FROM e),
      s0 AS (SELECT n AS start, CAST(g.w AS BIGINT) AS walk_id,
                    CAST(0 AS BIGINT) AS step, n AS node
             FROM nodes, generate_series(0, 2) g(w)),
      ${(1 to 5).map(step).mkString("\n")}
      tape AS (SELECT * FROM s0 UNION ALL SELECT * FROM s1 UNION ALL SELECT * FROM s2
               UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4 UNION ALL SELECT * FROM s5)
      SELECT start, walk_id, step, node FROM tape
      ORDER BY start, walk_id, step
      """.trim
    })

  /** Count-Min sketch ([[Sketches.countMinBuild]], d = 4 x w = 64)
    * over the corpus token stream, probed at the 20 highest-frequency
    * tokens with the exact counts alongside — the overcount column is
    * the sketch's signed audit (always >= 0 by construction). Build,
    * probe, and audit all replay exactly in SQL.
    */
  val q345CountMin = HarnessQuery(
    "q345_count_min",
    (spark, dir) => {
      val toks = Tables.documents(spark, dir)
        .select(explode(TextFunctions.tokens(col("text"))).as("token"))
        .where(col("token") =!= "")
      val sketch = Sketches.countMinBuild(toks, "token", d = 4, w = 64)
      val truth = toks.groupBy(col("token")).agg(count(lit(1)).as("true_n"))
      val top = truth.orderBy(col("true_n").desc, col("token")).limit(20)
      Sketches.countMinEstimate(sketch, top, "token", d = 4, w = 64)
        .join(top, Seq("token"))
        .select(col("token"), col("true_n"), col("cms_est"),
          (col("cms_est") - col("true_n")).as("overcount"))
        .orderBy(col("token"))
    },
    Some("""
      WITH tok AS (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
                   FROM documents),
      tk AS (SELECT token FROM tok WHERE token <> ''),
      cells AS (SELECT g.r AS row,
                       CAST(('0x' || substr(md5(concat_ws(':', g.r, token)), 1, 15)) AS BIGINT) % 64 AS bucket,
                       count(*) AS c
                FROM tk, generate_series(0, 3) g(r)
                GROUP BY 1, 2),
      truth AS (SELECT token, count(*) AS true_n FROM tk GROUP BY 1),
      top AS (SELECT token, true_n FROM truth ORDER BY true_n DESC, token LIMIT 20),
      probe AS (SELECT t.token, g.r AS row,
                       CAST(('0x' || substr(md5(concat_ws(':', g.r, t.token)), 1, 15)) AS BIGINT) % 64 AS bucket
                FROM top t, generate_series(0, 3) g(r)),
      est AS (SELECT p.token, min(coalesce(c.c, 0)) AS cms_est
              FROM probe p LEFT JOIN cells c USING (row, bucket) GROUP BY 1)
      SELECT t.token, t.true_n, e.cms_est, e.cms_est - t.true_n AS overcount
      FROM top t JOIN est e USING (token) ORDER BY token
    """.trim))

  /** Sliding 7-day Count-Min ([[Sketches.countMinSlidingCounts]]):
    * per-day pane sketches over event user ids merged by cell-wise sum
    * (the linear-sketch window merge), probed at the 3 hottest users
    * with the exact trailing counts alongside — frequency's companion
    * to the q324 HLL sliding-distinct audit.
    */
  val q349CmsSliding = HarnessQuery(
    "q349_cms_sliding",
    (spark, dir) =>
      Sketches.countMinSlidingCounts(Tables.events(spark, dir),
        "ts", "user_id", windowDays = 7, d = 4, w = 64, topProbes = 3)
        .orderBy(col("day"), col("item")),
    Some("""
      WITH ev AS (
        SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                 AS BIGINT) AS day,
               CAST(user_id AS VARCHAR) AS item
        FROM events),
      cells AS (SELECT day, g.r AS row,
                       CAST(('0x' || substr(md5(concat_ws(':', g.r, item)), 1, 15)) AS BIGINT) % 64 AS bucket,
                       count(*) AS c
                FROM ev, generate_series(0, 3) g(r)
                GROUP BY 1, 2, 3),
      days AS (SELECT DISTINCT day FROM ev),
      grid AS (SELECT d.day, r.r AS row, b.b AS bucket
               FROM days d, generate_series(0, 3) r(r), generate_series(0, 63) b(b)),
      mg AS (SELECT grid.day, grid.row, grid.bucket,
                    coalesce(sum(c.c) OVER (PARTITION BY grid.row, grid.bucket
                      ORDER BY grid.day
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 0) AS mc
             FROM grid LEFT JOIN cells c
               ON c.day = grid.day AND c.row = grid.row AND c.bucket = grid.bucket),
      probes AS (SELECT item FROM (
                   SELECT item, count(*) AS n FROM ev GROUP BY 1
                   ORDER BY n DESC, item LIMIT 3) t),
      pc AS (SELECT item, g.r AS row,
                    CAST(('0x' || substr(md5(concat_ws(':', g.r, item)), 1, 15)) AS BIGINT) % 64 AS bucket
             FROM probes, generate_series(0, 3) g(r)),
      est AS (SELECT m.day, p.item, CAST(min(m.mc) AS BIGINT) AS cms_est
              FROM mg m JOIN pc p ON m.row = p.row AND m.bucket = p.bucket
              GROUP BY 1, 2),
      pd AS (SELECT day, item, count(*) AS n FROM ev GROUP BY 1, 2),
      ex AS (SELECT days.day, pd.item, CAST(sum(pd.n) AS BIGINT) AS exact
             FROM days JOIN pd ON pd.day BETWEEN days.day - 6 AND days.day
             JOIN probes USING (item)
             GROUP BY 1, 2)
      SELECT e.day, e.item, e.cms_est,
             coalesce(x.exact, 0) AS exact,
             e.cms_est - coalesce(x.exact, 0) AS overcount
      FROM est e LEFT JOIN ex x ON e.day = x.day AND e.item = x.item
      ORDER BY e.day, e.item
    """.trim))

  /** Histogram-sketch quantiles ([[Sketches.histogramQuantiles]],
    * 32 equi-width bins) of event values per event type at q = 0.5 and
    * 0.95, with the exact rank statistic as the audit — the
    * bounded-state approx-percentile path, derandomized so the
    * estimate itself replays exactly in SQL.
    */
  val q352HistQuantiles = HarnessQuery(
    "q352_hist_quantiles",
    (spark, dir) =>
      Sketches.histogramQuantiles(Tables.events(spark, dir),
        "event_type", "value", bins = 32, qs = Seq(0.5, 0.95))
        .orderBy(col("event_type"), col("q")),
    Some("""
      WITH base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
                    FROM events WHERE value IS NOT NULL),
      stats AS (SELECT g, min(v) AS mn, max(v) AS mx, count(*) AS n
                FROM base GROUP BY 1),
      binned AS (SELECT b.g,
                        CASE WHEN s.mx = s.mn THEN 0
                             ELSE CAST(least(floor((b.v - s.mn) / ((s.mx - s.mn) / 32.0)), 31) AS BIGINT)
                        END AS bin
                 FROM base b JOIN stats s USING (g)),
      cells AS (SELECT g, bin, count(*) AS c FROM binned GROUP BY 1, 2),
      cum AS (SELECT g, bin, c,
                     sum(c) OVER (PARTITION BY g ORDER BY bin) AS cum
              FROM cells),
      ranked AS (SELECT g, v,
                        row_number() OVER (PARTITION BY g ORDER BY v) AS rk
                 FROM base),
      qk AS (SELECT s.g, s.mn, s.mx, s.n, qq.q,
                    CAST(ceil(qq.q * s.n) AS BIGINT) AS k
             FROM stats s CROSS JOIN
                  (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS q) qq),
      hit AS (SELECT * FROM (
                SELECT qk.g, qk.q, qk.mn, qk.mx, qk.n, qk.k,
                       c.bin, c.c, c.cum,
                       row_number() OVER (PARTITION BY qk.g, qk.q ORDER BY c.bin) AS r
                FROM qk JOIN cum c ON c.g = qk.g AND c.cum >= qk.k) z
              WHERE r = 1),
      est AS (SELECT g, q, n, k,
                     CASE WHEN mx = mn THEN mn
                          ELSE mn + (mx - mn) / 32.0
                               * (CAST(bin AS DOUBLE)
                                  + CAST(k - (cum - c) AS DOUBLE) / CAST(c AS DOUBLE))
                     END AS e
              FROM hit)
      SELECT e.g AS event_type, e.q, e.n, round(e.e, 12) AS est,
             r.v AS exact, round(abs(e.e - r.v), 12) AS abs_err
      FROM est e JOIN ranked r ON r.g = e.g AND r.rk = e.k
      ORDER BY event_type, q
    """.trim))

  /** MAD-based robust outlier audit ([[RankStats.madOutliers]],
    * k = 3): lower-median + lower-MAD per event type over the value
    * column — rank statistics only, so the whole audit replays exactly.
    */
  val q353MadOutliers = HarnessQuery(
    "q353_mad_outliers",
    (spark, dir) =>
      RankStats.madOutliers(Tables.events(spark, dir),
        "event_type", "value", k = 3.0)
        .orderBy(col("event_type")),
    Some("""
      WITH base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
                    FROM events WHERE value IS NOT NULL),
      r1 AS (SELECT g, v,
                    row_number() OVER (PARTITION BY g ORDER BY v) AS rk,
                    count(*) OVER (PARTITION BY g) AS n
             FROM base),
      med AS (SELECT g, v AS median FROM r1
              WHERE rk = CAST(ceil(n / 2.0) AS BIGINT)),
      dev AS (SELECT b.g, b.v, m.median, abs(b.v - m.median) AS d
              FROM base b JOIN med m USING (g)),
      r2 AS (SELECT g, d,
                    row_number() OVER (PARTITION BY g ORDER BY d) AS rk,
                    count(*) OVER (PARTITION BY g) AS n
             FROM dev),
      mad AS (SELECT g, d AS mad FROM r2
              WHERE rk = CAST(ceil(n / 2.0) AS BIGINT))
      SELECT dev.g AS event_type, count(*) AS n,
             min(dev.median) AS median, min(mad.mad) AS mad,
             CAST(sum(CASE WHEN dev.d > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers
      FROM dev JOIN mad USING (g)
      GROUP BY 1 ORDER BY 1
    """.trim))

  /** Personalized PageRank ([[Graphs.personalizedPageRank]]) over the
    * event-type transition graph with the two lexicographically first
    * types as the seed set — teleport and dangling mass go ONLY to the
    * seeds, non-seeds earn mass through edges. Three rounds unrolled
    * in SQL.
    */
  val q355SeedPpr = HarnessQuery(
    "q355_seed_ppr",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val edges = ev.withColumn("__next", lead(col("event_type"), 1).over(w))
        .filter(col("__next").isNotNull && col("__next") =!= col("event_type"))
        .select(col("event_type").as("src"), col("__next").as("dst"))
        .distinct()
      val verts = ev.select(col("event_type")).distinct()
      val seeds = verts.orderBy(col("event_type")).limit(2)
      Graphs.personalizedPageRank(verts, "event_type", seeds,
        edges, "src", "dst", iters = 3)
        .select(col("event_type"), round(col("ppr"), 12).as("ppr"))
        .orderBy(col("event_type"))
    },
    Some {
      val rnd = (i: Int) => s"""
      dang$i AS (
        SELECT coalesce(CAST(sum(CAST(p.pr AS DECIMAL(30,18))) AS DOUBLE),
                        CAST(0 AS DOUBLE)) AS dm
        FROM pr$i p LEFT JOIN deg d ON p.id = d.src WHERE d.src IS NULL),
      agg$i AS (
        SELECT e.dst AS id,
               CAST(sum(CAST(p.pr / d.od AS DECIMAL(30,18))) AS DOUBLE) AS s
        FROM edges e JOIN pr$i p ON e.src = p.id JOIN deg d ON e.src = d.src
        GROUP BY 1),
      pr${i + 1} AS (
        SELECT v.id,
               CAST(0.85 AS DOUBLE) * coalesce(a.s, CAST(0 AS DOUBLE))
                 + CASE WHEN sd.id IS NOT NULL
                        THEN (CAST(0.15000000000000002 AS DOUBLE)
                              + CAST(0.85 AS DOUBLE) * dg.dm) / nn.ns
                        ELSE CAST(0 AS DOUBLE) END AS pr
        FROM verts v LEFT JOIN agg$i a ON v.id = a.id
        LEFT JOIN seeds sd ON v.id = sd.id, dang$i dg, nn)"""
      s"""
      WITH ev AS (SELECT event_type,
                    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
                  FROM events),
      edges AS (SELECT DISTINCT event_type AS src, nxt AS dst FROM ev
                WHERE nxt IS NOT NULL AND nxt <> event_type),
      verts AS (SELECT DISTINCT event_type AS id FROM events),
      seeds AS (SELECT id FROM verts ORDER BY id LIMIT 2),
      deg AS (SELECT src, count(*) AS od FROM edges GROUP BY 1),
      nn AS (SELECT count(*) AS ns FROM seeds),
      pr0 AS (SELECT v.id,
                     CASE WHEN sd.id IS NOT NULL THEN CAST(1.0 AS DOUBLE) / nn.ns
                          ELSE CAST(0 AS DOUBLE) END AS pr
              FROM verts v LEFT JOIN seeds sd ON v.id = sd.id, nn),
      ${rnd(0)},
      ${rnd(1)},
      ${rnd(2)}
      SELECT id AS event_type, round(pr, 12) AS ppr
      FROM pr3 ORDER BY event_type
      """.trim
    })

  def all: Seq[HarnessQuery] = Seq(
    q343HashWalks, q345CountMin, q349CmsSliding, q352HistQuantiles,
    q353MadOutliers, q355SeedPpr,
    q312HllDistinct, q313PrefixJaccard, q314RidgeFit, q316Modularity,
    q317HoltTrend, q318DbscanCore, q319Sprt, q320Breakpoint,
    q321LooInfluence, q322IpwAte, q323RidgePath, q324HllSliding,
    q325PpsSample, q326AipwAte, q327Permutation, q328Cmh,
    q329Wilcoxon, q330Kappa, q331Lorenz, q332Hhi, q335Louvain,
    q372LouvainTwoLevel, q373WeightedLouvain, q376CoarseModularity,
    q404LouvainLevels, q418IncrementalLouvain,
    q381ClusterNmi)
}

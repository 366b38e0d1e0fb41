package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Classify, Encoding, Experiment, Graphs, HeavyHitters,
  Mixture, Privacy, RangeJoin, ScaleAudit, Similarity, TextAnalysis,
  TimeSeries}
import graft.sources.{BinaryFiles, Tables}

/** Distributed-training primitives as harness queries: naive Bayes,
  * full-batch logistic GD, the decision-stump split search, the
  * functional-dependency profiler, and the daily-series ACF. Each oracle
  * replays the identical arithmetic in DuckDB (ln/exp terms rounded to
  * 12 dp then decimal-summed; final statistics one double expression).
  */
object ClassifyQueries {

  /** Multinomial naive Bayes ([[Classify.naiveBayes]]): predict each
    * document's `lang` from its tokens, add-one smoothing,
    * resubstitution scoring. The ln(count+1) formulation keeps absent
    * (class, term) pairs at exactly 0, so the oracle's sparse join is
    * the same dataflow.
    */
  val q264NaiveBayes = HarnessQuery(
    "q264_naive_bayes",
    (spark, dir) =>
      Classify.naiveBayes(
        Tables.documents(spark, dir), "text", "doc_id", "lang")
        .orderBy(col("doc_id")),
    Some("""
      WITH toks AS (SELECT doc_id, lang,
                unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
              FROM documents),
      dt AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      dlen AS (SELECT doc_id, sum(tf) AS n FROM dt GROUP BY 1),
      ctc AS (SELECT lang AS cls, term, count(*) AS c FROM toks GROUP BY 1, 2),
      ct AS (SELECT cls, sum(c) AS tot FROM ctc GROUP BY 1),
      pri AS (SELECT lang AS cls, count(*) AS dc FROM documents GROUP BY 1),
      nd AS (SELECT count(*) AS d FROM documents),
      vv AS (SELECT count(DISTINCT term) AS v FROM ctc),
      cls AS (SELECT p.cls,
                CAST(round(ln(CAST(p.dc AS DOUBLE) / d.d), 12)
                     AS DECIMAL(38,12)) AS prior,
                CAST(round(ln(CAST(t.tot + vv.v AS DOUBLE)), 12)
                     AS DECIMAL(38,12)) AS denom
              FROM pri p JOIN ct t USING (cls), nd d, vv),
      part AS (SELECT dt.doc_id, ctc.cls,
                 sum(CAST(dt.tf * round(ln(CAST(ctc.c + 1 AS DOUBLE)), 12)
                          AS DECIMAL(38,12))) AS s
               FROM dt JOIN ctc USING (term) GROUP BY 1, 2),
      sc AS (SELECT dl.doc_id, c.cls,
               CAST(c.prior AS DOUBLE)
                 + CAST(coalesce(p.s, CAST(0 AS DECIMAL(38,12))) AS DOUBLE)
                 - CAST(dl.n AS DOUBLE) * CAST(c.denom AS DOUBLE) AS score
             FROM dlen dl CROSS JOIN cls c
             LEFT JOIN part p ON p.doc_id = dl.doc_id AND p.cls = c.cls)
      SELECT doc_id, cls AS pred, round(score, 10) AS score
      FROM sc
      QUALIFY row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, cls) = 1
      ORDER BY doc_id
    """.trim))

  /** Full-batch logistic GD ([[Classify.logisticGd]]): 3 rounds, lr 0.1,
    * predicting `label % 2` from the first two embedding coordinates.
    * The oracle unrolls the three rounds as CTEs — every weight is
    * round-tripped through 12 dp exactly as the operator does.
    */
  val q265LogisticGd = HarnessQuery(
    "q265_logistic_gd",
    (spark, dir) => {
      val e = Tables.embeddings(spark, dir)
        .withColumn("y", col("label") % 2)
      Classify.logisticGd(
        e, Seq(col("embedding")(0), col("embedding")(1)), "y",
        iters = 3, lr = 0.1)
    },
    Some("""
      WITH e AS (SELECT CAST(label % 2 AS DOUBLE) AS y,
                        CAST(embedding[1] AS DOUBLE) AS x0,
                        CAST(embedding[2] AS DOUBLE) AS x1
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
             FROM g3, w2)
      SELECT 3 AS iters, round(b, 10) AS w_intercept,
             round(w0, 10) AS w_0, round(w1, 10) AS w_1
      FROM w3
    """.trim))

  /** Weak-label quality classifier, trained AND applied in one plan
    * ([[TextAnalysis.qualityScore]] features → [[Classify.logisticGd]]
    * → broadcast-weights scoring): the FineWeb/RefinedWeb trick —
    * treat two sources as the "reference" class, everything else as
    * crawl, fit a 3-feature logistic model (mean token length, punct
    * ratio, digit ratio; 3 rounds, lr 0.1), then score every document
    * with the trained weights and gate at 0.5. The oracle replays the
    * feature extraction, unrolls all three GD rounds with the 12 dp
    * weight round-trip, and applies the same 10 dp-rounded weights.
    */
  /** The q417/q444 shared feature frame: 3 quality features per doc
    * with the FineWeb-style weak label (reference sources = 1).
    */
  private def qualityFeats(
      spark: org.apache.spark.sql.SparkSession, dir: String) =
    TextAnalysis.qualityScore(Tables.documents(spark, dir), "text")
      .withColumn("y",
        col("source").isin("src0", "src1").cast("int"))
      .select(col("doc_id"), col("y"), col("mean_token_len"),
        col("punct_ratio"), col("digit_ratio"))

  /** Score every doc with a (broadcast) logistic weight row and gate
    * at 0.5 — shared by q417 (fresh weights) and q444 (loaded).
    */
  private def scoreWithWeights(
      feats: org.apache.spark.sql.DataFrame,
      w: org.apache.spark.sql.DataFrame) =
    feats.crossJoin(broadcast(w))
      .withColumn("score", round(lit(1.0) / (lit(1.0) +
        exp(-(col("w_intercept")
          + col("w_0") * col("mean_token_len")
          + col("w_1") * col("punct_ratio")
          + col("w_2") * col("digit_ratio")))), 10))
      .select(col("doc_id"), col("score"),
        (col("score") > 0.5).cast("int").as("kept"))
      .orderBy(col("doc_id"))

  val q417QualityClassifier = HarnessQuery(
    "q417_quality_classifier",
    (spark, dir) => {
      val feats = qualityFeats(spark, dir)
      val w = Classify.logisticGd(feats,
        Seq(col("mean_token_len"), col("punct_ratio"), col("digit_ratio")),
        "y", iters = 3, lr = 0.1)
      scoreWithWeights(feats, w)
    },
    Some("""
      WITH t AS (SELECT doc_id, source, text,
                        regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
                        length(text) AS n_chars
                 FROM documents),
      f AS (SELECT doc_id,
              CASE WHEN source IN ('src0', 'src1')
                   THEN 1.0 ELSE 0.0 END AS y,
              CAST(length(array_to_string(toks, '')) AS DOUBLE)
                / len(toks) AS x0,
              CAST(n_chars - length(regexp_replace(text, '[[:punct:]]', '', 'g'))
                AS DOUBLE) / nullif(n_chars, 0) AS x1,
              CAST(n_chars - length(regexp_replace(text, '[0-9]', '', 'g'))
                AS DOUBLE) / nullif(n_chars, 0) AS x2
            FROM t),
      g1 AS (SELECT
               sum(CAST(round(1.0/(1.0+exp(-(0.0))) - y, 12)
                        AS DECIMAL(38,12))) AS s0,
               sum(CAST(round((1.0/(1.0+exp(-(0.0))) - y) * x0, 12)
                        AS DECIMAL(38,12))) AS s1,
               sum(CAST(round((1.0/(1.0+exp(-(0.0))) - y) * x1, 12)
                        AS DECIMAL(38,12))) AS s2,
               sum(CAST(round((1.0/(1.0+exp(-(0.0))) - y) * x2, 12)
                        AS DECIMAL(38,12))) AS s3,
               count(*) AS n FROM f),
      w1 AS (SELECT round(0.0 - 0.1 * (CAST(s0 AS DOUBLE) / n), 12) AS b,
                    round(0.0 - 0.1 * (CAST(s1 AS DOUBLE) / n), 12) AS w0,
                    round(0.0 - 0.1 * (CAST(s2 AS DOUBLE) / n), 12) AS w1,
                    round(0.0 - 0.1 * (CAST(s3 AS DOUBLE) / n), 12) AS w2
             FROM g1),
      g2 AS (SELECT
               sum(CAST(round(1.0/(1.0+exp(-(b + w0*x0 + w1*x1 + w2*x2))) - y, 12)
                        AS DECIMAL(38,12))) AS s0,
               sum(CAST(round((1.0/(1.0+exp(-(b + w0*x0 + w1*x1 + w2*x2))) - y) * x0, 12)
                        AS DECIMAL(38,12))) AS s1,
               sum(CAST(round((1.0/(1.0+exp(-(b + w0*x0 + w1*x1 + w2*x2))) - y) * x1, 12)
                        AS DECIMAL(38,12))) AS s2,
               sum(CAST(round((1.0/(1.0+exp(-(b + w0*x0 + w1*x1 + w2*x2))) - y) * x2, 12)
                        AS DECIMAL(38,12))) AS s3,
               count(*) AS n FROM f, w1),
      w2t AS (SELECT round(w1.b - 0.1 * (CAST(s0 AS DOUBLE) / n), 12) AS b,
                     round(w1.w0 - 0.1 * (CAST(s1 AS DOUBLE) / n), 12) AS w0,
                     round(w1.w1 - 0.1 * (CAST(s2 AS DOUBLE) / n), 12) AS w1,
                     round(w1.w2 - 0.1 * (CAST(s3 AS DOUBLE) / n), 12) AS w2
              FROM g2, w1),
      g3 AS (SELECT
               sum(CAST(round(1.0/(1.0+exp(-(b + w0*x0 + w1*x1 + w2*x2))) - y, 12)
                        AS DECIMAL(38,12))) AS s0,
               sum(CAST(round((1.0/(1.0+exp(-(b + w0*x0 + w1*x1 + w2*x2))) - y) * x0, 12)
                        AS DECIMAL(38,12))) AS s1,
               sum(CAST(round((1.0/(1.0+exp(-(b + w0*x0 + w1*x1 + w2*x2))) - y) * x1, 12)
                        AS DECIMAL(38,12))) AS s2,
               sum(CAST(round((1.0/(1.0+exp(-(b + w0*x0 + w1*x1 + w2*x2))) - y) * x2, 12)
                        AS DECIMAL(38,12))) AS s3,
               count(*) AS n FROM f, w2t),
      w3 AS (SELECT round(w2t.b - 0.1 * (CAST(s0 AS DOUBLE) / n), 12) AS b,
                    round(w2t.w0 - 0.1 * (CAST(s1 AS DOUBLE) / n), 12) AS w0,
                    round(w2t.w1 - 0.1 * (CAST(s2 AS DOUBLE) / n), 12) AS w1,
                    round(w2t.w2 - 0.1 * (CAST(s3 AS DOUBLE) / n), 12) AS w2
             FROM g3, w2t),
      wf AS (SELECT round(b, 10) AS b, round(w0, 10) AS w0,
                    round(w1, 10) AS w1, round(w2, 10) AS w2
             FROM w3),
      sc AS (SELECT f.doc_id,
               round(1.0/(1.0+exp(-(wf.b + wf.w0*f.x0 + wf.w1*f.x1
                                    + wf.w2*f.x2))), 10) AS score
             FROM f, wf)
      SELECT doc_id, score,
             CAST(CASE WHEN score > 0.5 THEN 1 ELSE 0 END AS INT) AS kept
      FROM sc ORDER BY doc_id
    """.trim))

  /** Persisted quality classifier ([[Classify.saveWeights]] /
    * [[Classify.loadWeights]]): q417's weak-label logistic model is
    * trained ONCE, its weight row lands as parquet, and every
    * document is scored with the LOADED weights — the train-once /
    * score-everywhere split for the LAST trained artifact without a
    * persisted twin (bigram LM q442, tokenizers q401/q402/q428, ANN
    * q374, minhash q435 all persist). At 100 TB the classifier
    * trains on a sample and scores everything; fusing re-pays
    * training every pass. Weights are doubles; parquet round-trips
    * them bit-exactly, so this reproduces q417 row-for-row — the
    * oracle is q417's VERBATIM.
    */
  val q444ClassifierPersisted = HarnessQuery(
    "q444_classifier_persisted",
    (spark, dir) => {
      val path = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_q444_classifier")
        .getAbsolutePath
      val feats = qualityFeats(spark, dir)
      Classify.saveWeights(
        Classify.logisticGd(feats,
          Seq(col("mean_token_len"), col("punct_ratio"),
            col("digit_ratio")),
          "y", iters = 3, lr = 0.1),
        path)
      scoreWithWeights(feats, Classify.loadWeights(spark, path))
    },
    q417QualityClassifier.oracle)

  /** Decision stump ([[Classify.decisionStump]]): best Gini threshold on
    * `value` for predicting purchases. The cumulative window runs over
    * DISTINCT feature values (bounded 2-dp domain), not rows.
    */
  val q266DecisionStump = HarnessQuery(
    "q266_decision_stump",
    (spark, dir) =>
      Classify.decisionStump(
        Tables.events(spark, dir), "value",
        col("event_type") === "purchase"),
    Some("""
      WITH a AS (SELECT "value" AS v,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p,
               count(*) AS n
             FROM events WHERE "value" IS NOT NULL GROUP BY 1),
      t AS (SELECT sum(p) AS tp, sum(n) AS tn FROM a),
      c AS (SELECT v, sum(p) OVER (ORDER BY v) AS cp,
                   sum(n) OVER (ORDER BY v) AS cn FROM a),
      o AS (SELECT c.v, c.cp, c.cn, t.tp, t.tn,
              (CAST(cn AS DOUBLE)
                 - (CAST(cp AS DOUBLE) * CAST(cp AS DOUBLE)
                    + CAST(cn - cp AS DOUBLE) * CAST(cn - cp AS DOUBLE))
                   / CAST(cn AS DOUBLE))
            + (CAST(tn - cn AS DOUBLE)
                 - (CAST(tp - cp AS DOUBLE) * CAST(tp - cp AS DOUBLE)
                    + CAST((tn - cn) - (tp - cp) AS DOUBLE)
                      * CAST((tn - cn) - (tp - cp) AS DOUBLE))
                   / CAST(tn - cn AS DOUBLE)) AS obj
            FROM c, t WHERE c.cn < t.tn)
      SELECT v AS threshold, CAST(cn AS BIGINT) AS n_left,
             CAST(tn - cn AS BIGINT) AS n_right,
             CAST(cp AS BIGINT) AS pos_left,
             CAST(tp - cp AS BIGINT) AS pos_right,
             round(obj / CAST(tn AS DOUBLE), 10) AS gini_after
      FROM o QUALIFY row_number() OVER (ORDER BY obj, v) = 1
    """.trim))

  /** Functional-dependency audit ([[Classify.fdViolations]]) over three
    * lineitem candidate FDs — the g3' fraction of rows violating
    * determinant → dependent.
    */
  val q267FdAudit = HarnessQuery(
    "q267_fd_audit",
    (spark, dir) =>
      Classify.fdViolations(
        Tables.lineitem(spark, dir),
        Seq("l_orderkey" -> "l_returnflag",
          "l_partkey" -> "l_linestatus",
          "l_suppkey" -> "l_returnflag"))
        .orderBy(col("determinant"), col("dependent")),
    Some("""
      WITH c1 AS (SELECT l_orderkey AS det, l_returnflag AS dep, count(*) AS c
                  FROM lineitem
                  WHERE l_orderkey IS NOT NULL AND l_returnflag IS NOT NULL
                  GROUP BY 1, 2),
      g1 AS (SELECT det, max(c) AS m, sum(c) AS s FROM c1 GROUP BY 1),
      r1 AS (SELECT 'l_orderkey' AS determinant, 'l_returnflag' AS dependent,
                    count(*) AS n_groups, CAST(sum(s) AS BIGINT) AS n_rows,
                    round(1.0 - CAST(sum(m) AS DOUBLE) / CAST(sum(s) AS DOUBLE),
                          10) AS violation_rate
             FROM g1),
      c2 AS (SELECT l_partkey AS det, l_linestatus AS dep, count(*) AS c
             FROM lineitem
             WHERE l_partkey IS NOT NULL AND l_linestatus IS NOT NULL
             GROUP BY 1, 2),
      g2 AS (SELECT det, max(c) AS m, sum(c) AS s FROM c2 GROUP BY 1),
      r2 AS (SELECT 'l_partkey' AS determinant, 'l_linestatus' AS dependent,
                    count(*) AS n_groups, CAST(sum(s) AS BIGINT) AS n_rows,
                    round(1.0 - CAST(sum(m) AS DOUBLE) / CAST(sum(s) AS DOUBLE),
                          10) AS violation_rate
             FROM g2),
      c3 AS (SELECT l_suppkey AS det, l_returnflag AS dep, count(*) AS c
             FROM lineitem
             WHERE l_suppkey IS NOT NULL AND l_returnflag IS NOT NULL
             GROUP BY 1, 2),
      g3 AS (SELECT det, max(c) AS m, sum(c) AS s FROM c3 GROUP BY 1),
      r3 AS (SELECT 'l_suppkey' AS determinant, 'l_returnflag' AS dependent,
                    count(*) AS n_groups, CAST(sum(s) AS BIGINT) AS n_rows,
                    round(1.0 - CAST(sum(m) AS DOUBLE) / CAST(sum(s) AS DOUBLE),
                          10) AS violation_rate
             FROM g3)
      SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
      ORDER BY determinant, dependent
    """.trim))

  /** Daily-count ACF per event type at lags 1..7 ([[TimeSeries.acf]]) —
    * the seasonality comb of the forecasting dashboard.
    */
  val q268Acf = HarnessQuery(
    "q268_acf",
    (spark, dir) =>
      TimeSeries.acf(Tables.events(spark, dir), "event_type", "ts", 7)
        .orderBy(col("event_type"), col("lag")),
    Some("""
      WITH d AS (SELECT event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
                   count(*) AS n
                 FROM events GROUP BY 1, 2),
      st AS (SELECT event_type,
               CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean,
               count(*) AS t
             FROM d GROUP BY 1),
      l AS (SELECT d.event_type, day, CAST(n AS DOUBLE) - mean AS dd, t,
              lag(CAST(n AS DOUBLE) - mean, 1) OVER w AS l1,
              lag(CAST(n AS DOUBLE) - mean, 2) OVER w AS l2,
              lag(CAST(n AS DOUBLE) - mean, 3) OVER w AS l3,
              lag(CAST(n AS DOUBLE) - mean, 4) OVER w AS l4,
              lag(CAST(n AS DOUBLE) - mean, 5) OVER w AS l5,
              lag(CAST(n AS DOUBLE) - mean, 6) OVER w AS l6,
              lag(CAST(n AS DOUBLE) - mean, 7) OVER w AS l7
            FROM d JOIN st USING (event_type)
            WINDOW w AS (PARTITION BY d.event_type ORDER BY day)),
      den AS (SELECT event_type,
                CAST(sum(CAST(round(dd * dd, 12) AS DECIMAL(38,12)))
                     AS DOUBLE) AS den,
                max(t) AS n_days
              FROM l GROUP BY 1),
      num AS (SELECT event_type,
                CAST(sum(CAST(round(dd * l1, 12) AS DECIMAL(38,12))) AS DOUBLE) AS n1,
                CAST(sum(CAST(round(dd * l2, 12) AS DECIMAL(38,12))) AS DOUBLE) AS n2,
                CAST(sum(CAST(round(dd * l3, 12) AS DECIMAL(38,12))) AS DOUBLE) AS n3,
                CAST(sum(CAST(round(dd * l4, 12) AS DECIMAL(38,12))) AS DOUBLE) AS n4,
                CAST(sum(CAST(round(dd * l5, 12) AS DECIMAL(38,12))) AS DOUBLE) AS n5,
                CAST(sum(CAST(round(dd * l6, 12) AS DECIMAL(38,12))) AS DOUBLE) AS n6,
                CAST(sum(CAST(round(dd * l7, 12) AS DECIMAL(38,12))) AS DOUBLE) AS n7
              FROM l GROUP BY 1)
      SELECT event_type, lag, n_days, acf FROM (
        SELECT n.event_type, 1 AS lag, d.n_days, round(n1 / den, 10) AS acf
        FROM num n JOIN den d USING (event_type)
        UNION ALL SELECT n.event_type, 2, d.n_days, round(n2 / den, 10)
        FROM num n JOIN den d USING (event_type)
        UNION ALL SELECT n.event_type, 3, d.n_days, round(n3 / den, 10)
        FROM num n JOIN den d USING (event_type)
        UNION ALL SELECT n.event_type, 4, d.n_days, round(n4 / den, 10)
        FROM num n JOIN den d USING (event_type)
        UNION ALL SELECT n.event_type, 5, d.n_days, round(n5 / den, 10)
        FROM num n JOIN den d USING (event_type)
        UNION ALL SELECT n.event_type, 6, d.n_days, round(n6 / den, 10)
        FROM num n JOIN den d USING (event_type)
        UNION ALL SELECT n.event_type, 7, d.n_days, round(n7 / den, 10)
        FROM num n JOIN den d USING (event_type)
      ) ORDER BY event_type, lag
    """.trim))

  /** Count–Min sketch accuracy audit ([[HeavyHitters.cmsAudit]]): a
    * 3×32 sketch over event user_ids (150 keys → guaranteed collisions)
    * with the md5-salted bucket hash replayed by the oracle, so the
    * ESTIMATES — not just the errors — pin exactly.
    */
  val q269CmsAudit = HarnessQuery(
    "q269_cms_audit",
    (spark, dir) =>
      HeavyHitters.cmsAudit(Tables.events(spark, dir), "user_id", 3, 32)
        .orderBy(col("exact").desc, col("user_id")),
    Some("""
      WITH k AS (SELECT CAST(user_id AS VARCHAR) AS user_id
                 FROM events WHERE user_id IS NOT NULL),
      r AS (SELECT unnest([0, 1, 2]) AS row),
      cells AS (SELECT r.row,
                  CAST(('0x' || substr(md5(CAST(r.row AS VARCHAR) || ':' || user_id), 1, 15))
                       AS BIGINT) % 32 AS bucket,
                  count(*) AS cell
                FROM k, r GROUP BY 1, 2),
      exact AS (SELECT user_id, count(*) AS exact FROM k GROUP BY 1),
      est AS (SELECT e.user_id, e.exact, min(c.cell) AS cms_estimate
              FROM exact e CROSS JOIN r
              JOIN cells c ON c.row = r.row
                AND c.bucket =
                  CAST(('0x' || substr(md5(CAST(r.row AS VARCHAR) || ':' || e.user_id), 1, 15))
                       AS BIGINT) % 32
              GROUP BY 1, 2)
      SELECT user_id, exact, cms_estimate,
             cms_estimate - exact AS overestimate
      FROM est ORDER BY exact DESC, user_id
    """.trim))

  /** Two rounds of gradient-boosted regression stumps
    * ([[Classify.boostedStumps]]): value ~ hour-of-day, shrinkage 0.5.
    * The oracle unrolls both rounds — residuals of round 2 are an
    * expression over round 1's collected stump, exactly as the
    * operator computes them.
    */
  val q270BoostedStumps = HarnessQuery(
    "q270_boosted_stumps",
    (spark, dir) =>
      Classify.boostedStumps(
        Tables.events(spark, dir)
          .withColumn("hod",
            expr("(unix_micros(ts) div 3600000000) % 24").cast("double")),
        "hod", "value", rounds = 2, shrinkage = 0.5)
        .orderBy(col("round")),
    Some("""
      WITH e AS (SELECT
               CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24
                    AS DOUBLE) AS x,
               "value" AS y
             FROM events WHERE "value" IS NOT NULL),
      f0 AS (SELECT round(CAST(sum(CAST(y AS DECIMAL(28,6))) AS DOUBLE)
                          / count(*), 12) AS b FROM e),
      a1 AS (SELECT x, sum(CAST(round(y - b, 12) AS DECIMAL(38,12))) AS s,
                    count(*) AS n
             FROM e, f0 GROUP BY 1),
      t1 AS (SELECT sum(s) AS ts, sum(n) AS tn FROM a1),
      c1 AS (SELECT x, sum(s) OVER (ORDER BY x) AS cs,
                    sum(n) OVER (ORDER BY x) AS cn FROM a1),
      o1 AS (SELECT c1.x, cs, cn, ts, tn,
               CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE)
             + CAST(ts - cs AS DOUBLE) * CAST(ts - cs AS DOUBLE)
               / CAST(tn - cn AS DOUBLE) AS obj
             FROM c1, t1 WHERE cn < tn),
      w1 AS (SELECT x AS t, cs, cn, ts, tn, obj,
               round(CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE), 12) AS l,
               round((CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE))
                     / CAST(tn - cn AS DOUBLE), 12) AS r
             FROM o1 QUALIFY row_number() OVER (ORDER BY obj DESC, x) = 1),
      a2 AS (SELECT x,
               sum(CAST(round(y - (b + 0.5 *
                     (CASE WHEN x <= w1.t THEN w1.l ELSE w1.r END)), 12)
                   AS DECIMAL(38,12))) AS s,
               count(*) AS n
             FROM e, f0, w1 GROUP BY 1),
      t2 AS (SELECT sum(s) AS ts, sum(n) AS tn FROM a2),
      c2 AS (SELECT x, sum(s) OVER (ORDER BY x) AS cs,
                    sum(n) OVER (ORDER BY x) AS cn FROM a2),
      o2 AS (SELECT c2.x, cs, cn, ts, tn,
               CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE)
             + CAST(ts - cs AS DOUBLE) * CAST(ts - cs AS DOUBLE)
               / CAST(tn - cn AS DOUBLE) AS obj
             FROM c2, t2 WHERE cn < tn),
      w2 AS (SELECT x AS t, cs, cn, ts, tn, obj,
               round(CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE), 12) AS l,
               round((CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE))
                     / CAST(tn - cn AS DOUBLE), 12) AS r
             FROM o2 QUALIFY row_number() OVER (ORDER BY obj DESC, x) = 1)
      SELECT 1 AS round, t AS threshold, CAST(cn AS BIGINT) AS n_left,
             CAST(tn - cn AS BIGINT) AS n_right,
             round(l, 10) AS left_value, round(r, 10) AS right_value,
             round((obj - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE)
                    / CAST(tn AS DOUBLE)) / CAST(tn AS DOUBLE), 10) AS gain
      FROM w1
      UNION ALL
      SELECT 2, t, CAST(cn AS BIGINT), CAST(tn - cn AS BIGINT),
             round(l, 10), round(r, 10),
             round((obj - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE)
                    / CAST(tn AS DOUBLE)) / CAST(tn AS DOUBLE), 10)
      FROM w2
      ORDER BY round
    """.trim))

  /** Neyman-allocation stratified sample ([[Mixture.neymanSample]]):
    * 500 rows across event types, variance-optimal split, md5-rank
    * membership replayed by the oracle.
    */
  val q272Neyman = HarnessQuery(
    "q272_neyman",
    (spark, dir) =>
      Mixture.neymanSample(
        Tables.events(spark, dir), "event_type", "value", "event_id", 500)
        .orderBy(col("event_type")),
    Some("""
      WITH b AS (SELECT event_type, event_id, "value"
                 FROM events WHERE "value" IS NOT NULL),
      m AS (SELECT event_type, count(*) AS n,
              sum(CAST("value" AS DECIMAL(28,6))) AS s,
              sum(CAST("value" * "value" AS DECIMAL(28,6))) AS q
            FROM b GROUP BY 1),
      wgt AS (SELECT event_type, n,
               round(sqrt(greatest(
                 (CAST(q AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                 / CAST(n AS DOUBLE), 0.0)), 12) AS sd
             FROM m),
      wg2 AS (SELECT *, round(CAST(n AS DOUBLE) * sd, 12) AS w FROM wgt),
      tw AS (SELECT CAST(sum(CAST(w AS DECIMAL(38,12))) AS DOUBLE) AS tw
             FROM wg2),
      al AS (SELECT event_type, n, sd,
               least(n, CAST(floor(500.0 * w / tw) AS BIGINT)) AS alloc
             FROM wg2, tw),
      rk AS (SELECT b.event_type, b."value",
               row_number() OVER (PARTITION BY b.event_type
                 ORDER BY CAST(('0x' || substr(md5(b.event_type || ':'
                   || CAST(b.event_id AS VARCHAR)), 1, 15)) AS BIGINT),
                   b.event_id) AS rn,
               a.alloc
             FROM b JOIN al a USING (event_type)),
      sm AS (SELECT event_type, sum(CAST("value" AS DECIMAL(28,6))) AS ss,
                    count(*) AS sn
             FROM rk WHERE rn <= alloc GROUP BY 1)
      SELECT a.event_type, CAST(a.n AS BIGINT) AS n, round(a.sd, 10) AS sd,
             a.alloc,
             round(CAST(sm.ss AS DOUBLE) / CAST(sm.sn AS DOUBLE), 10)
               AS sample_mean
      FROM al a LEFT JOIN sm USING (event_type) ORDER BY event_type
    """.trim))

  /** HITS hubs/authorities ([[Graphs.hits]]) on the customer→supplier
    * purchase graph (orders ⋈ lineitem), two L1-normalized rounds —
    * every per-vertex score rounded at 12, every normalizer an exact
    * decimal fold, so the oracle's unrolled chain lands bit-identically.
    */
  val q273Hits = HarnessQuery(
    "q273_hits",
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
      val l = Tables.lineitem(spark, dir)
      val edges = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      Graphs.hits(edges, "src", "dst", iters = 2)
        .orderBy(col("side"), col("vertex"))
    },
    Some("""
      WITH e AS (SELECT DISTINCT o.o_custkey AS src, l.l_suppkey AS dst
                 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      h0r AS (SELECT DISTINCT src FROM e),
      h0t AS (SELECT CAST(sum(CAST(1.0 AS DECIMAL(38,12))) AS DOUBLE) AS t
              FROM h0r),
      h0 AS (SELECT src, round(1.0 / t, 12) AS h FROM h0r, h0t),
      a1r AS (SELECT dst, CAST(sum(CAST(h AS DECIMAL(38,12))) AS DOUBLE) AS a
              FROM e JOIN h0 USING (src) GROUP BY 1),
      a1t AS (SELECT CAST(sum(CAST(a AS DECIMAL(38,12))) AS DOUBLE) AS t
              FROM a1r),
      a1 AS (SELECT dst, round(a / t, 12) AS a FROM a1r, a1t),
      h1r AS (SELECT src, CAST(sum(CAST(a AS DECIMAL(38,12))) AS DOUBLE) AS h
              FROM e JOIN a1 USING (dst) GROUP BY 1),
      h1t AS (SELECT CAST(sum(CAST(h AS DECIMAL(38,12))) AS DOUBLE) AS t
              FROM h1r),
      h1 AS (SELECT src, round(h / t, 12) AS h FROM h1r, h1t),
      a2r AS (SELECT dst, CAST(sum(CAST(h AS DECIMAL(38,12))) AS DOUBLE) AS a
              FROM e JOIN h1 USING (src) GROUP BY 1),
      a2t AS (SELECT CAST(sum(CAST(a AS DECIMAL(38,12))) AS DOUBLE) AS t
              FROM a2r),
      a2 AS (SELECT dst, round(a / t, 12) AS a FROM a2r, a2t),
      h2r AS (SELECT src, CAST(sum(CAST(a AS DECIMAL(38,12))) AS DOUBLE) AS h
              FROM e JOIN a2 USING (dst) GROUP BY 1),
      h2t AS (SELECT CAST(sum(CAST(h AS DECIMAL(38,12))) AS DOUBLE) AS t
              FROM h2r),
      h2 AS (SELECT src, round(h / t, 12) AS h FROM h2r, h2t)
      SELECT src AS vertex, 'hub' AS side, h AS score FROM h2
      UNION ALL
      SELECT dst AS vertex, 'auth' AS side, a AS score FROM a2
      ORDER BY side, vertex
    """.trim))

  /** Rocchio nearest-centroid classification
    * ([[Similarity.nearestCentroid]]) over the embeddings table — the
    * one-aggregate baseline classifier, reported as a confusion matrix.
    */
  val q274NearestCentroid = HarnessQuery(
    "q274_nearest_centroid",
    (spark, dir) =>
      Similarity.nearestCentroid(
        Tables.embeddings(spark, dir), "vec_id", "embedding", "label")
        .orderBy(col("label"), col("pred")),
    Some("""
      WITH dims AS (SELECT vec_id, label, g.i - 1 AS d,
                      CAST(embedding[g.i] AS DOUBLE) AS x
                    FROM embeddings, generate_series(1, 64) g(i)),
      cent AS (SELECT label AS c, d,
                 round(CAST(sum(CAST(x AS DECIMAL(30,12))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE), 12) AS cx
               FROM dims GROUP BY 1, 2),
      cn AS (SELECT c, sqrt(CAST(sum(CAST(cx * cx AS DECIMAL(30,18)))
                            AS DOUBLE)) AS cnrm
             FROM cent GROUP BY 1),
      vn AS (SELECT vec_id, sqrt(CAST(sum(CAST(x * x AS DECIMAL(30,18)))
                                 AS DOUBLE)) AS vnrm
             FROM dims GROUP BY 1),
      sc AS (SELECT dims.vec_id, dims.label, cent.c,
               CAST(sum(CAST(x * cx AS DECIMAL(30,18))) AS DOUBLE) AS dot
             FROM dims JOIN cent USING (d) GROUP BY 1, 2, 3),
      cosd AS (SELECT sc.vec_id, sc.label, sc.c,
                 dot / (vnrm * cnrm) AS cs
               FROM sc JOIN cn USING (c) JOIN vn USING (vec_id)),
      best AS (SELECT label, c AS pred FROM cosd
               QUALIFY row_number() OVER (PARTITION BY vec_id
                 ORDER BY cs DESC, c) = 1)
      SELECT label, pred, count(*) AS n FROM best
      GROUP BY 1, 2 ORDER BY 1, 2
    """.trim))

  /** Trigram stupid-backoff LM scoring
    * ([[TextAnalysis.trigramBackoffLogProb]]) against a src0/src1
    * reference corpus — the corpus-scale LM of Brants et al. 2007,
    * completing the unigram (q93) / bigram (q119) ladder.
    */
  val q275TrigramLm = HarnessQuery(
    "q275_trigram_lm",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      TextAnalysis.trigramBackoffLogProb(
        docs, docs.filter(col("source").isin("src0", "src1")),
        "text", "doc_id")
        // floor-snap, not round: round() diverges across engines at
        // half boundaries (q119 flipped red on one at sf0.001)
        .withColumn("trigram_logprob",
          floor(col("trigram_logprob") * 1e10) / 1e10)
        .select(col("doc_id"), col("n_trigrams"), col("trigram_logprob"),
          (floor(exp(-col("trigram_logprob")) * 1e8) / 1e8).as("perplexity"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH ref AS (
        SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS a
        FROM documents WHERE source IN ('src0', 'src1')),
      refuni AS (
        SELECT t.term, count(*) AS uc
        FROM (SELECT unnest(a) AS term FROM ref) t GROUP BY 1),
      refstats AS (
        SELECT CAST(sum(uc) AS DOUBLE) AS tot,
               CAST(count(*) AS DOUBLE) AS v FROM refuni),
      refbg AS (
        SELECT w1, w2, count(*) AS bc FROM (
          SELECT unnest(a[1:len(a)-1]) AS w1, unnest(a[2:len(a)]) AS w2
          FROM ref WHERE len(a) >= 2) GROUP BY 1, 2),
      reftg AS (
        SELECT w1, w2, w3, count(*) AS tc FROM (
          SELECT unnest(a[1:len(a)-2]) AS w1, unnest(a[2:len(a)-1]) AS w2,
                 unnest(a[3:len(a)]) AS w3
          FROM ref WHERE len(a) >= 3) GROUP BY 1, 2, 3),
      docs AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
        FROM documents),
      dtg AS (
        SELECT doc_id, w1, w2, w3, count(*) AS n FROM (
          SELECT doc_id, unnest(a[1:len(a)-2]) AS w1,
                 unnest(a[2:len(a)-1]) AS w2, unnest(a[3:len(a)]) AS w3
          FROM docs WHERE len(a) >= 3) GROUP BY 1, 2, 3, 4),
      scored AS (
        SELECT dtg.doc_id, dtg.n,
          CASE WHEN t.tc IS NOT NULL
            THEN CAST(t.tc AS DOUBLE) / CAST(b12.bc AS DOUBLE)
          ELSE 0.4 * (CASE WHEN b23.bc IS NOT NULL
              THEN CAST(b23.bc AS DOUBLE) / CAST(u2.uc AS DOUBLE)
            ELSE 0.4 * (CASE WHEN u3.uc IS NOT NULL
                THEN CAST(u3.uc AS DOUBLE) / s.tot
              ELSE 1.0 / (s.tot + s.v) END) END) END AS p
        FROM dtg
        LEFT JOIN reftg t ON t.w1 = dtg.w1 AND t.w2 = dtg.w2
          AND t.w3 = dtg.w3
        LEFT JOIN refbg b12 ON b12.w1 = dtg.w1 AND b12.w2 = dtg.w2
        LEFT JOIN refbg b23 ON b23.w1 = dtg.w2 AND b23.w2 = dtg.w3
        LEFT JOIN refuni u2 ON u2.term = dtg.w2
        LEFT JOIN refuni u3 ON u3.term = dtg.w3, refstats s),
      base AS (
        SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_trigrams,
               floor(CAST(sum(CAST(n * ln(p) AS DECIMAL(30,12))) AS DOUBLE)
                     / sum(n) * 1e10) / 1e10 AS trigram_logprob
        FROM scored GROUP BY doc_id)
      SELECT doc_id, n_trigrams, trigram_logprob,
             floor(exp(-trigram_logprob) * 1e8) / 1e8 AS perplexity
      FROM base ORDER BY doc_id
    """.trim))

  /** Huber-robust per-type trend ([[Experiment.huberOlsByGroup]]):
    * value ~ epoch-day per event type, one IRLS step over the exact
    * median-absolute-residual scale.
    */
  val q276Huber = HarnessQuery(
    "q276_huber",
    (spark, dir) =>
      Experiment.huberOlsByGroup(
        Tables.events(spark, dir)
          .withColumn("day",
            expr("unix_micros(ts) div 86400000000").cast("double")),
        "event_type", "day", "value")
        .orderBy(col("event_type")),
    Some("""
      WITH b AS (SELECT event_type,
               CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                    AS DOUBLE) AS x,
               "value" AS y
             FROM events WHERE "value" IS NOT NULL),
      t AS (SELECT event_type, x, y,
              CAST(x AS DECIMAL(19,6)) AS dx,
              CAST(y AS DECIMAL(19,6)) AS dy
            FROM b),
      m AS (SELECT event_type,
              CAST(count(*) AS DECIMAL(10,0)) AS n,
              CAST(sum(dx) AS DECIMAL(19,6)) AS sx,
              CAST(sum(dy) AS DECIMAL(19,6)) AS sy,
              CAST(sum(dx * dy) AS DECIMAL(28,12)) AS sxy,
              CAST(sum(dx * dx) AS DECIMAL(28,12)) AS sxx
            FROM t GROUP BY 1),
      o AS (SELECT event_type,
              CAST(n * sxy - sx * sy AS DOUBLE) AS num,
              CAST(n * sxx - sx * sx AS DOUBLE) AS denx,
              CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
              CAST(n AS DOUBLE) AS nd
            FROM m),
      fit AS (SELECT event_type,
                CASE WHEN denx > 0 THEN num / denx END AS slope_ols,
                floor((CASE WHEN denx > 0 THEN num / denx END) * 1e9)
                  / 1e9 AS b0,
                floor((CASE WHEN denx > 0 THEN
                  (syd - (num / denx) * sxd) / nd END) * 1e9) / 1e9 AS a0
              FROM o),
      ctr AS (SELECT event_type,
                CAST(floor(CAST(sum(CAST(x AS DECIMAL(19,6))) AS DOUBLE)
                           / count(*)) AS DOUBLE) AS x0,
                CAST(floor(CAST(sum(CAST(y AS DECIMAL(19,6))) AS DOUBLE)
                           / count(*)) AS DOUBLE) AS y0
              FROM t GROUP BY 1),
      r AS (SELECT t.event_type, t.x, t.y,
              t.y - (f.a0 + f.b0 * t.x) AS rr
            FROM t JOIN fit f USING (event_type)),
      sc AS (SELECT event_type,
               floor(quantile_cont(abs(rr), 0.5) * 1e9) / 1e9 AS tau
             FROM r GROUP BY 1),
      w AS (SELECT r.event_type, r.rr, s.tau,
              r.x - c.x0 AS xc, r.y - c.y0 AS yc,
              CASE WHEN s.tau <= 0 THEN 10000
                   WHEN abs(r.rr) <= 1.345 * s.tau THEN 10000
                   ELSE CAST(floor(1.345 * s.tau / abs(r.rr) * 1e4)
                             AS BIGINT) END AS wi
            FROM r JOIN sc s USING (event_type)
                   JOIN ctr c USING (event_type)),
      wa AS (SELECT event_type, count(*) AS n,
               CAST(sum(CAST(wi AS DECIMAL(10,0))) AS DOUBLE) AS sw,
               CAST(sum(CAST(wi AS DECIMAL(10,0))
                        * CAST(xc AS DECIMAL(19,6))) AS DOUBLE) AS swx,
               CAST(sum(CAST(wi AS DECIMAL(10,0))
                        * CAST(yc AS DECIMAL(19,6))) AS DOUBLE) AS swy,
               CAST(sum(CAST(wi AS DECIMAL(10,0))
                        * CAST(xc * yc AS DECIMAL(19,4))) AS DOUBLE) AS swxy,
               CAST(sum(CAST(wi AS DECIMAL(10,0))
                        * CAST(xc * xc AS DECIMAL(19,4))) AS DOUBLE) AS swxx,
               CAST(sum(CASE WHEN wi < 10000 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_downweighted
             FROM w GROUP BY 1)
      SELECT wa.event_type, wa.n,
             floor(f.slope_ols * 1e10) / 1e10 AS slope_ols,
             floor((CASE WHEN sw * swxx - swx * swx > 0 THEN
               (sw * swxy - swx * swy) / (sw * swxx - swx * swx) END)
               * 1e10) / 1e10 AS slope_huber,
             floor((CASE WHEN sw * swxx - swx * swx > 0 THEN
               (swy / sw + c.y0)
               - ((sw * swxy - swx * swy) / (sw * swxx - swx * swx))
                 * (swx / sw + c.x0) END) * 1e10) / 1e10 AS intercept_huber,
             floor(s.tau * 1e10) / 1e10 AS scale,
             wa.n_downweighted
      FROM wa JOIN fit f USING (event_type) JOIN sc s USING (event_type)
             JOIN ctr c USING (event_type)
      ORDER BY event_type
    """.trim))

  /** KMV distinct-count audit ([[HeavyHitters.kmvDistinctAudit]]):
    * k=16 minimum md5 hashes of users per event type — the estimate
    * itself replays in the oracle, not just the error.
    */
  val q277Kmv = HarnessQuery(
    "q277_kmv",
    (spark, dir) =>
      HeavyHitters.kmvDistinctAudit(
        Tables.events(spark, dir), "event_type", "user_id", 16)
        .orderBy(col("event_type")),
    Some("""
      WITH d AS (SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS item
                 FROM events WHERE user_id IS NOT NULL),
      h AS (SELECT event_type, item,
              CAST(('0x' || substr(md5(item), 1, 15)) AS BIGINT) AS hv
            FROM d),
      r AS (SELECT event_type, hv,
              row_number() OVER (PARTITION BY event_type
                ORDER BY hv, item) AS rn
            FROM h),
      a AS (SELECT event_type, count(*) AS exact_distinct,
              max(CASE WHEN rn = 16 THEN hv END) AS hk
            FROM r GROUP BY 1)
      SELECT event_type, exact_distinct,
             CASE WHEN hk IS NOT NULL
               THEN round(15.0 / (CAST(hk AS DOUBLE)
                                  / 1.152921504606846976e18), 4)
               ELSE CAST(exact_distinct AS DOUBLE) END AS kmv_estimate
      FROM a ORDER BY 1
    """.trim))

  /** Theta-style KMV set operations ([[HeavyHitters.kmvSetOps]]):
    * snapshot-overlap estimation between the token sets of the
    * low-numbered and high-numbered sources — union, intersection,
    * and Jaccard estimated from two 128-row sketches (θ = k-th
    * smallest hash of the sketch union; every estimate replays from
    * the deterministic md5 hashes), with the exact counts riding
    * along for the audit. The recrawl-dedup budgeting question at
    * 100 TB, answered without a corpus-x-corpus join.
    */
  val q416KmvSetOps = HarnessQuery(
    "q416_kmv_set_ops",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val srcNum = regexp_extract(col("source"), "([0-9]+)$", 1).cast("int")
      val toks = docs.select(srcNum.as("__sn"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("item"))
      HeavyHitters.kmvSetOps(
        toks.filter(col("__sn") < 10), toks.filter(col("__sn") >= 10),
        "item", k = 128)
    },
    Some("""
      WITH toks AS (
        SELECT CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT) AS sn,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                 AS item
        FROM documents),
      ia AS (SELECT DISTINCT item FROM toks WHERE sn < 10),
      ib AS (SELECT DISTINCT item FROM toks WHERE sn >= 10),
      ha AS (SELECT item,
               CAST(('0x' || substr(md5(item), 1, 15)) AS BIGINT) AS h
             FROM ia),
      hb AS (SELECT item,
               CAST(('0x' || substr(md5(item), 1, 15)) AS BIGINT) AS h
             FROM ib),
      ka AS (SELECT * FROM ha ORDER BY h, item LIMIT 128),
      kb AS (SELECT * FROM hb ORDER BY h, item LIMIT 128),
      ku AS (SELECT * FROM (
               SELECT * FROM ka UNION SELECT * FROM kb)
             ORDER BY h, item LIMIT 128),
      th AS (SELECT max(h) AS theta,
                    CAST(count(*) AS BIGINT) AS union_sketch_size
             FROM ku),
      c AS (SELECT CAST(count(*) AS BIGINT) AS matches_below_theta
            FROM ka JOIN kb USING (item, h), th
            WHERE ka.h <= th.theta),
      ex AS (SELECT
               (SELECT CAST(count(*) AS BIGINT) FROM
                 (SELECT item FROM ia UNION SELECT item FROM ib))
                 AS exact_union,
               (SELECT CAST(count(*) AS BIGINT) FROM ia
                 WHERE item IN (SELECT item FROM ib))
                 AS exact_intersection)
      SELECT ex.exact_union, ex.exact_intersection,
             CAST(128 AS INT) AS sketch_k,
             th.union_sketch_size, c.matches_below_theta,
             CASE WHEN th.union_sketch_size < 128
               THEN CAST(th.union_sketch_size AS DOUBLE)
               ELSE round(127.0 / (CAST(th.theta AS DOUBLE)
                 / 1.152921504606846976e18), 4) END AS est_union,
             CASE WHEN th.union_sketch_size < 128
               THEN CAST(c.matches_below_theta AS DOUBLE)
               ELSE round(CAST(c.matches_below_theta AS DOUBLE)
                 / (CAST(th.theta AS DOUBLE)
                    / 1.152921504606846976e18), 4) END AS est_intersection,
             CASE WHEN th.union_sketch_size < 128
               THEN round(CAST(c.matches_below_theta AS DOUBLE)
                 / th.union_sketch_size, 4)
               ELSE round(CAST(c.matches_below_theta AS DOUBLE) / 128.0, 4)
             END AS est_jaccard
      FROM ex, th, c
    """.trim))

  /** Classical additive decomposition ([[TimeSeries.decomposeDaily]])
    * of per-type daily counts: centered 7-day MA trend, sum-zero
    * day-of-week seasonal, residual.
    */
  val q278Decompose = HarnessQuery(
    "q278_decompose",
    (spark, dir) =>
      TimeSeries.decomposeDaily(Tables.events(spark, dir), "event_type", "ts")
        .orderBy(col("event_type"), col("day")),
    Some("""
      WITH d AS (SELECT event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
                   count(*) AS n
                 FROM events GROUP BY 1, 2),
      t AS (SELECT *,
              CASE WHEN count(*) OVER w7 = 7
                THEN CAST(sum(n) OVER w7 AS DOUBLE) / 7.0 END AS trend,
              (day + 3) % 7 AS dow
            FROM d
            WINDOW w7 AS (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      de AS (SELECT *,
               floor((CAST(n AS DOUBLE) - trend) * 1e9) / 1e9 AS det
             FROM t),
      dm AS (SELECT event_type, dow,
               CAST(sum(CAST(det AS DECIMAL(38,9))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS dmean
             FROM de WHERE det IS NOT NULL GROUP BY 1, 2),
      nm AS (SELECT event_type, dow,
               floor(dmean * 1e9) / 1e9 AS sdm,
               sum(floor(dmean * 1e9) / 1e9) OVER
                 (PARTITION BY event_type ORDER BY dow) AS cum,
               count(*) OVER (PARTITION BY event_type) AS k
             FROM dm),
      nm2 AS (SELECT event_type, dow,
                floor((sdm - (last_value(cum) OVER
                  (PARTITION BY event_type ORDER BY dow
                   ROWS BETWEEN UNBOUNDED PRECEDING
                     AND UNBOUNDED FOLLOWING)) / CAST(k AS DOUBLE))
                  * 1e9) / 1e9 AS seasonal
              FROM nm)
      SELECT de.event_type, de.day, de.n, de.trend, nm2.seasonal,
             CASE WHEN de.trend IS NOT NULL THEN
               floor((CAST(de.n AS DOUBLE) - de.trend - nm2.seasonal)
                 * 1e9) / 1e9 END AS residual
      FROM de LEFT JOIN nm2 ON nm2.event_type = de.event_type
        AND nm2.dow = de.dow
      ORDER BY 1, 2
    """.trim))

  /** t-closeness audit ([[Privacy.tClosenessAudit]]): market-segment
    * distribution per nation vs the corpus-wide distribution, total
    * variation distance, threshold 0.15.
    */
  val q279TCloseness = HarnessQuery(
    "q279_t_closeness",
    (spark, dir) =>
      Privacy.tClosenessAudit(
        Tables.customer(spark, dir), Seq("c_nationkey"), "c_mktsegment",
        t = 0.15)
        .orderBy(col("c_nationkey")),
    Some("""
      WITH cls AS (SELECT c_nationkey, count(*) AS class_size
                   FROM customer GROUP BY 1),
      cv AS (SELECT c_nationkey, c_mktsegment AS v, count(*) AS c
             FROM customer GROUP BY 1, 2),
      gv AS (SELECT c_mktsegment AS v, count(*) AS g
             FROM customer GROUP BY 1),
      tot AS (SELECT CAST(sum(g) AS BIGINT) AS tot FROM gv),
      grid AS (SELECT cls.c_nationkey, cls.class_size, gv.v, gv.g,
                 tot.tot, cv.c
               FROM cls CROSS JOIN gv CROSS JOIN tot
               LEFT JOIN cv ON cv.c_nationkey = cls.c_nationkey
                 AND cv.v = gv.v),
      terms AS (SELECT c_nationkey, class_size,
                  CAST(floor(abs(CAST(coalesce(c, 0) AS DOUBLE)
                        / CAST(class_size AS DOUBLE)
                      - CAST(g AS DOUBLE) / CAST(tot AS DOUBLE))
                    * 1e12) / 1e12 AS DECIMAL(38,12)) AS term
                FROM grid),
      agg AS (SELECT c_nationkey, class_size,
                0.5 * CAST(sum(term) AS DOUBLE) AS tvd
              FROM terms GROUP BY 1, 2)
      SELECT c_nationkey, class_size,
             floor(tvd * 1e12) / 1e12 AS tvd,
             floor(tvd * 1e12) / 1e12 > 0.15 AS t_violation
      FROM agg ORDER BY c_nationkey
    """.trim))

  /** Simplified silhouette ([[Similarity.simplifiedSilhouette]]) of the
    * embeddings labeling — per-cluster mean and misassignment share via
    * point-to-centroid distances only (the O(n) silhouette).
    */
  val q280Silhouette = HarnessQuery(
    "q280_silhouette",
    (spark, dir) =>
      Similarity.simplifiedSilhouette(
        Tables.embeddings(spark, dir), "vec_id", "embedding", "label")
        .orderBy(col("label")),
    Some("""
      WITH dims AS (SELECT vec_id, label, g.i - 1 AS d,
                      CAST(embedding[g.i] AS DOUBLE) AS x
                    FROM embeddings, generate_series(1, 64) g(i)),
      cent AS (SELECT label AS c, d,
                 round(CAST(sum(CAST(x AS DECIMAL(30,12))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE), 12) AS cx
               FROM dims GROUP BY 1, 2),
      d2 AS (SELECT dims.vec_id, dims.label, cent.c,
               CAST(sum(CAST((x - cx) * (x - cx) AS DECIMAL(30,18)))
                    AS DOUBLE) AS dd
             FROM dims JOIN cent USING (d) GROUP BY 1, 2, 3),
      pp AS (SELECT vec_id, label,
               sqrt(max(CASE WHEN label = c THEN dd END)) AS a,
               sqrt(min(CASE WHEN label <> c THEN dd END)) AS b
             FROM d2 GROUP BY 1, 2),
      sil AS (SELECT vec_id, label,
                floor((b - a) / greatest(a, b) * 1e9) / 1e9 AS s
              FROM pp)
      SELECT label, count(*) AS n,
             floor((CAST(sum(CAST(s AS DECIMAL(38,9))) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE)) * 1e9) / 1e9
               AS mean_silhouette,
             CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_negative
      FROM sil GROUP BY 1 ORDER BY 1
    """.trim))

  /** nDCG@5 of the LSH index vs exact cosine ([[Similarity.lshNdcgAtK]])
    * — rank-discounted retrieval quality where q146's recall is
    * set-based; the oracle replays the full LSH pipeline (q146's CTEs)
    * and re-ranks with the same log2 discounts.
    */
  val q281Ndcg = HarnessQuery(
    "q281_ndcg",
    (spark, dir) => {
      val em = Tables.embeddings(spark, dir)
      Similarity.lshNdcgAtK(
        em, em.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, numBits = 8, bands = 4)
        .orderBy(col("query_id"))
    },
    Some("""
      WITH n AS (
        SELECT vec_id, embedding,
               sqrt(CAST(sum(CAST(CAST(embedding[g.i] AS DOUBLE) * CAST(embedding[g.i] AS DOUBLE)
                 AS DECIMAL(30,18))) AS DOUBLE)) AS nrm
        FROM embeddings, generate_series(1, 64) g(i) GROUP BY 1, 2),
      expairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(sum(CAST(CAST(q.embedding[g.i] AS DOUBLE) * CAST(c.embedding[g.i] AS DOUBLE)
                 AS DECIMAL(30,18))) AS DOUBLE) / (any_value(q.nrm) * any_value(c.nrm)) AS cosine
        FROM n q, n c, generate_series(1, 64) g(i)
        WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id
        GROUP BY 1, 2),
      ex AS (
        SELECT query_id, neighbor_id, rank FROM (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rank
          FROM expairs) WHERE rank <= 5),
      hp AS (
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
        WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
      apscored AS (
        SELECT cand.query_id, cand.neighbor_id,
               CAST(sum(CAST(CAST(q.embedding[g.i] AS DOUBLE) * CAST(c.embedding[g.i] AS DOUBLE)
                 AS DECIMAL(30,18))) AS DOUBLE) / (any_value(q.nrm) * any_value(c.nrm)) AS cosine
        FROM cand
        JOIN n q ON q.vec_id = cand.query_id
        JOIN n c ON c.vec_id = cand.neighbor_id,
        generate_series(1, 64) g(i)
        GROUP BY 1, 2),
      ap AS (
        SELECT query_id, neighbor_id, rank FROM (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rank
          FROM apscored) WHERE rank <= 5),
      dcg AS (
        SELECT a.query_id,
               CAST(sum(CAST(CASE WHEN e.neighbor_id IS NOT NULL
                 THEN floor(1.0 / log2(CAST(a.rank AS DOUBLE) + 1.0) * 1e12)
                      / 1e12
                 ELSE 0.0 END AS DECIMAL(38,12))) AS DOUBLE) AS dcg
        FROM ap a LEFT JOIN ex e ON e.query_id = a.query_id
          AND e.neighbor_id = a.neighbor_id
        GROUP BY 1),
      idcg AS (
        SELECT query_id, count(*) AS n_exact,
               CAST(sum(CAST(floor(1.0 / log2(CAST(rank AS DOUBLE) + 1.0)
                 * 1e12) / 1e12 AS DECIMAL(38,12))) AS DOUBLE) AS idcg
        FROM ex GROUP BY 1)
      SELECT i.query_id, i.n_exact,
             floor(coalesce(d.dcg, 0.0) / i.idcg * 1e12) / 1e12 AS ndcg
      FROM idcg i LEFT JOIN dcg d USING (query_id)
      ORDER BY i.query_id
    """.trim))

  /** Rendezvous-hash shard audit ([[ScaleAudit.rendezvousShards]]):
    * users routed to 4 nodes by highest md5 weight; per-node balance
    * vs the even split.
    */
  val q282Rendezvous = HarnessQuery(
    "q282_rendezvous",
    (spark, dir) =>
      ScaleAudit.rendezvousShards(
        Tables.events(spark, dir), "user_id",
        Seq("node0", "node1", "node2", "node3"))
        .orderBy(col("node")),
    Some("""
      WITH k AS (SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
                 FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      nd AS (SELECT unnest(['node0', 'node1', 'node2', 'node3']) AS node),
      w AS (SELECT k.key, k.cnt, nd.node,
              CAST(('0x' || substr(md5(nd.node || ':' || k.key), 1, 15))
                   AS BIGINT) AS wt
            FROM k, nd),
      a AS (SELECT key, cnt, node FROM w
            QUALIFY row_number() OVER (PARTITION BY key
              ORDER BY wt DESC, node DESC) = 1),
      t AS (SELECT count(*) AS kk, CAST(sum(cnt) AS BIGINT) AS rr FROM a)
      SELECT node, count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS DOUBLE) / (CAST(t.kk AS DOUBLE) / 4.0)
               AS key_balance,
             CAST(sum(cnt) AS DOUBLE) / (CAST(t.rr AS DOUBLE) / 4.0)
               AS row_balance
      FROM a, t GROUP BY node, t.kk, t.rr ORDER BY node
    """.trim))

  /** Beta-binomial empirical-Bayes smoothing
    * ([[Encoding.ebShrinkRates]]) of per-user big-purchase rates — the
    * smoothed-CTR primitive; the oracle refits the method-of-moments
    * prior and replays the shrinkage.
    */
  val q283EbShrink = HarnessQuery(
    "q283_eb_shrink",
    (spark, dir) =>
      Encoding.ebShrinkRates(
        Tables.events(spark, dir), "user_id",
        col("event_type") === "purchase" && col("value") > 300.0d)
        .orderBy(col("user_id")),
    Some("""
      WITH per AS (SELECT user_id, count(*) AS n,
               CAST(sum(CASE WHEN event_type = 'purchase' AND "value" > 300
                 THEN 1 ELSE 0 END) AS BIGINT) AS c
             FROM events GROUP BY 1),
      pr AS (SELECT *, CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS rate
             FROM per),
      mo AS (SELECT count(*) AS k,
               CAST(sum(CAST(floor(rate * 1e12) / 1e12 AS DECIMAL(38,12)))
                    AS DOUBLE) AS s,
               CAST(sum(CAST(floor(rate * rate * 1e12) / 1e12
                    AS DECIMAL(38,12))) AS DOUBLE) AS q
             FROM pr),
      ab AS (SELECT
               CASE WHEN (q / k - (s / k) * (s / k)) > 0
                     AND (q / k - (s / k) * (s / k))
                         < (s / k) * (1.0 - s / k)
                 THEN floor((s / k) * ((s / k) * (1.0 - s / k)
                        / (q / k - (s / k) * (s / k)) - 1.0) * 1e12) / 1e12
                 ELSE 0.0 END AS alpha,
               CASE WHEN (q / k - (s / k) * (s / k)) > 0
                     AND (q / k - (s / k) * (s / k))
                         < (s / k) * (1.0 - s / k)
                 THEN floor((1.0 - s / k) * ((s / k) * (1.0 - s / k)
                        / (q / k - (s / k) * (s / k)) - 1.0) * 1e12) / 1e12
                 ELSE 0.0 END AS beta
             FROM mo)
      SELECT user_id, n, c,
             floor(rate * 1e12) / 1e12 AS rate,
             floor((CAST(c AS DOUBLE) + alpha)
                   / (CAST(n AS DOUBLE) + alpha + beta) * 1e12) / 1e12
               AS shrunk_rate,
             alpha, beta
      FROM pr, ab ORDER BY user_id
    """.trim))

  /** Rank-1 ALS ([[Classify.alsRank1]]) on the (user, event-type,
    * mean value) cell table — one item half-step, one user half-step,
    * both unrolled in the oracle.
    */
  val q284Als = HarnessQuery(
    "q284_als",
    (spark, dir) =>
      Classify.alsRank1(
        Tables.events(spark, dir), "user_id", "event_type", "value",
        halfSteps = 2)
        .orderBy(col("user_id")),
    Some("""
      WITH cells AS (
        SELECT user_id AS u, event_type AS i,
               floor(CAST(sum(CAST("value" AS DECIMAL(28,6))) AS DOUBLE)
                     / count(*) * 1e6) / 1e6 AS y
        FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
          AND "value" IS NOT NULL
        GROUP BY 1, 2),
      v AS (
        SELECT i,
               floor(CAST(sum(CAST(floor(1.0 * y * 1e6) / 1e6
                     AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(sum(CAST(floor(1.0 * 1.0 * 1e6) / 1e6
                     AS DECIMAL(38,6))) AS DOUBLE) * 1e9) / 1e9 AS vf
        FROM cells GROUP BY 1),
      uu AS (
        SELECT u,
               floor(CAST(sum(CAST(floor(vf * y * 1e6) / 1e6
                     AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(sum(CAST(floor(vf * vf * 1e6) / 1e6
                     AS DECIMAL(38,6))) AS DOUBLE) * 1e9) / 1e9 AS uf,
               count(*) AS k
        FROM cells JOIN v USING (i) GROUP BY 1)
      SELECT u AS user_id, uf AS u_factor, k AS n_items
      FROM uu ORDER BY user_id
    """.trim))

  /** Sentence segmentation stats ([[TextAnalysis.sentenceStats]]) —
    * the Gopher mean-words-per-sentence quality signal.
    */
  val q285SentenceStats = HarnessQuery(
    "q285_sentence_stats",
    (spark, dir) =>
      TextAnalysis.sentenceStats(Tables.documents(spark, dir), "text",
        "doc_id")
        .orderBy(col("doc_id")),
    Some("""
      WITH segs AS (
        SELECT doc_id, trim(seg) AS seg FROM (
          SELECT doc_id,
                 unnest(regexp_split_to_array(text, '[.!?]+')) AS seg
          FROM documents)
        WHERE length(trim(seg)) > 0),
      wc AS (SELECT doc_id,
               CAST(len(regexp_split_to_array(seg, '\s+')) AS BIGINT) AS w
             FROM segs)
      SELECT doc_id, count(*) AS n_sentences,
             CAST(sum(w) AS BIGINT) AS n_words,
             CAST(sum(w) AS DOUBLE) / count(*) AS mean_sentence_words,
             min(w) AS min_sentence_words,
             max(w) AS max_sentence_words
      FROM wc GROUP BY 1 ORDER BY 1
    """.trim))

  /** Co-sortedness audit ([[ScaleAudit.sortednessAudit]]): how sorted
    * does `value` come out under a (event_type, ts) layout — the
    * min/max-pruning planning number.
    */
  val q286Sortedness = HarnessQuery(
    "q286_sortedness",
    (spark, dir) =>
      ScaleAudit.sortednessAudit(
        Tables.events(spark, dir), "event_type", "ts", "event_id", "value")
        .orderBy(col("event_type")),
    Some("""
      WITH mk AS (
        SELECT event_type, ts, event_id, "value" AS v,
               CASE WHEN "value" < lag("value") OVER w
                 THEN 1 ELSE 0 END AS d
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
      rn AS (SELECT *,
               sum(d) OVER (PARTITION BY event_type
                 ORDER BY ts, event_id) AS run
             FROM mk),
      runs AS (SELECT event_type, run, count(*) AS len
               FROM rn GROUP BY 1, 2),
      pk AS (SELECT event_type, count(*) AS n,
               CAST(sum(d) AS BIGINT) AS n_descents
             FROM rn GROUP BY 1),
      lr AS (SELECT event_type, CAST(max(len) AS BIGINT) AS longest_run
             FROM runs GROUP BY 1)
      SELECT pk.event_type, pk.n, pk.n_descents,
             CAST(pk.n_descents AS DOUBLE)
               / CAST(greatest(pk.n - 1, 1) AS DOUBLE) AS descent_frac,
             lr.longest_run
      FROM pk JOIN lr USING (event_type) ORDER BY 1
    """.trim))

  /** Flesch reading ease ([[TextAnalysis.fleschReadingEase]]) with the
    * vowel-group syllable proxy.
    */
  val q287Flesch = HarnessQuery(
    "q287_flesch",
    (spark, dir) =>
      TextAnalysis.fleschReadingEase(
        Tables.documents(spark, dir), "text", "doc_id")
        .orderBy(col("doc_id")),
    Some("""
      WITH base AS (
        SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                 s -> length(trim(s)) > 0)) AS BIGINT) AS n_sentences,
               CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
                 AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                 AS BIGINT) AS n_syllables
        FROM documents)
      SELECT doc_id, n_sentences, n_words, n_syllables,
             floor((206.835
               - 1.015 * (CAST(n_words AS DOUBLE)
                          / CAST(n_sentences AS DOUBLE))
               - 84.6 * (CAST(n_syllables AS DOUBLE)
                         / CAST(n_words AS DOUBLE))) * 1e6) / 1e6 AS flesch
      FROM base
      WHERE n_sentences > 0 AND n_words > 0
      ORDER BY doc_id
    """.trim))

  /** Per-class discriminative tokens
    * ([[Classify.naiveBayesTopFeatures]]): top-5 by smoothed log-odds
    * for each `lang` — the review table behind q264's classifier.
    */
  val q288NbFeatures = HarnessQuery(
    "q288_nb_features",
    (spark, dir) =>
      Classify.naiveBayesTopFeatures(
        Tables.documents(spark, dir), "text", "lang", k = 5)
        .orderBy(col("label"), col("rank")),
    Some("""
      WITH toks AS (SELECT lang AS cls,
              unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
            FROM documents),
      ctc AS (SELECT cls, term, count(*) AS c FROM toks GROUP BY 1, 2),
      ct AS (SELECT cls, CAST(sum(c) AS BIGINT) AS tc FROM ctc GROUP BY 1),
      gl AS (SELECT term, CAST(sum(c) AS BIGINT) AS g FROM ctc GROUP BY 1),
      tt AS (SELECT CAST(sum(c) AS BIGINT) AS t,
                    count(DISTINCT term) AS v FROM ctc),
      sc AS (SELECT ctc.cls, ctc.term,
               ln(CAST(ctc.c + 1 AS DOUBLE) / CAST(ct.tc + tt.v AS DOUBLE))
               - ln(CAST(gl.g - ctc.c + 1 AS DOUBLE)
                    / CAST(tt.t - ct.tc + tt.v AS DOUBLE)) AS lo
             FROM ctc JOIN ct USING (cls) JOIN gl USING (term), tt),
      rk AS (SELECT cls, term, lo,
               row_number() OVER (PARTITION BY cls
                 ORDER BY lo DESC, term) AS rk
             FROM sc)
      SELECT cls AS label, CAST(rk AS BIGINT) AS rank, term,
             floor(lo * 1e10) / 1e10 AS log_odds
      FROM rk WHERE rk <= 5 ORDER BY label, rank
    """.trim))

  /** binaryFile ingestion round-trip ([[BinaryFiles]]): the first 20
    * documents written as raw UTF-8 files, re-read through Spark's
    * `binaryFile` source, fingerprinted — the oracle recomputes byte
    * length and md5 from the parquet-side text, so any ingestion drift
    * (encoding, truncation, path mixups) hash-mismatches.
    */
  val q289BinaryIngest = HarnessQuery(
    "q289_binary_ingest",
    (spark, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q289").toFile
      tmp.deleteOnExit()
      val binDir = new java.io.File(tmp, "docs_bin").getPath
      val docs = Tables.documents(spark, dir)
        .where(col("doc_id") < 20)
        .select(col("doc_id"), col("text"))
        .collect() // 20 bounded fixture rows — provisioning, not dataflow
        .map(r => (f"doc_${r.getLong(0)}%05d.txt", r.getString(1)))
      BinaryFiles.writeTextFiles(docs.toSeq, binDir)
      BinaryFiles.fingerprints(BinaryFiles.readDir(spark, binDir))
        .orderBy(col("file_name"))
    },
    Some("""
      SELECT printf('doc_%05d.txt', doc_id) AS file_name,
             CAST(octet_length(encode(text)) AS BIGINT) AS length,
             md5(text) AS content_md5
      FROM documents WHERE doc_id < 20
      ORDER BY file_name
    """.trim))

  /** Point-in-time feature enrichment ([[RangeJoin.asOfJoinKeyed]]):
    * each event picks up its user's latest order (keyed backward
    * as-of, ties to the smallest orderkey) plus the user's previous
    * event value — the two-feature-table feature-store join, leakage-
    * safe by construction (only rows with rightOn <= ts qualify).
    */
  val q290PitEnrich = HarnessQuery(
    "q290_pit_enrich",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
      val orders = Tables.orders(spark, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
      val withOrder = RangeJoin.asOfJoinKeyed(
        ev, orders, "user_id", "o_custkey", "ts", "o_orderdate",
        "event_id", rightTieBreak = Seq("o_orderkey"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      withOrder
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("last_order_key"),
          col("o_totalprice").as("last_order_total"),
          col("prev_value"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH j AS (
        SELECT e.event_id, e.user_id, e.ts, e."value",
               o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                 ORDER BY o.o_orderdate DESC NULLS LAST,
                          o.o_orderkey NULLS LAST) AS rn
        FROM events e LEFT JOIN orders o
          ON o.o_custkey = e.user_id
          AND CAST(e.ts AS TIMESTAMP) >= o.o_orderdate),
      base AS (SELECT * FROM j WHERE rn = 1)
      SELECT event_id, user_id,
             o_orderkey AS last_order_key,
             o_totalprice AS last_order_total,
             lag("value") OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_value
      FROM base ORDER BY event_id
    """.trim))

  /** Three BPE merge rounds ([[TextAnalysis.bpeMerges]]) learned from
    * the documents corpus — trained on the vocab table, each round an
    * explode + weighted count + one-row argmax, unrolled in the
    * oracle.
    */
  val q291Bpe = HarnessQuery(
    "q291_bpe",
    (spark, dir) =>
      TextAnalysis.bpeMerges(Tables.documents(spark, dir), "text", 3)
        .orderBy(col("round")),
    Some("""
      WITH v AS (SELECT w, count(*) AS f FROM (
               SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                 AS w
               FROM documents) GROUP BY 1),
      r0 AS (SELECT w, f,
               ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS repr
             FROM v),
      p1 AS (SELECT l, r, CAST(sum(f) AS BIGINT) AS c FROM (
               SELECT f, unnest(s[1:len(s)-1]) AS l,
                      unnest(s[2:len(s)]) AS r
               FROM (SELECT f, regexp_split_to_array(trim(repr), ' ') AS s
                     FROM r0)
               WHERE len(s) >= 2)
             GROUP BY 1, 2),
      w1 AS (SELECT l, r, c FROM p1
             QUALIFY row_number() OVER (ORDER BY c DESC, l, r) = 1),
      r1 AS (SELECT r0.w, r0.f,
               replace(r0.repr, ' ' || w1.l || ' ' || w1.r || ' ',
                 ' ' || w1.l || w1.r || ' ') AS repr
             FROM r0, w1),
      p2 AS (SELECT l, r, CAST(sum(f) AS BIGINT) AS c FROM (
               SELECT f, unnest(s[1:len(s)-1]) AS l,
                      unnest(s[2:len(s)]) AS r
               FROM (SELECT f, regexp_split_to_array(trim(repr), ' ') AS s
                     FROM r1)
               WHERE len(s) >= 2)
             GROUP BY 1, 2),
      w2 AS (SELECT l, r, c FROM p2
             QUALIFY row_number() OVER (ORDER BY c DESC, l, r) = 1),
      r2 AS (SELECT r1.w, r1.f,
               replace(r1.repr, ' ' || w2.l || ' ' || w2.r || ' ',
                 ' ' || w2.l || w2.r || ' ') AS repr
             FROM r1, w2),
      p3 AS (SELECT l, r, CAST(sum(f) AS BIGINT) AS c FROM (
               SELECT f, unnest(s[1:len(s)-1]) AS l,
                      unnest(s[2:len(s)]) AS r
               FROM (SELECT f, regexp_split_to_array(trim(repr), ' ') AS s
                     FROM r2)
               WHERE len(s) >= 2)
             GROUP BY 1, 2),
      w3 AS (SELECT l, r, c FROM p3
             QUALIFY row_number() OVER (ORDER BY c DESC, l, r) = 1)
      SELECT 1 AS round, l AS merge_left, r AS merge_right, c AS pair_count
      FROM w1
      UNION ALL SELECT 2, l, r, c FROM w2
      UNION ALL SELECT 3, l, r, c FROM w3
      ORDER BY round
    """.trim))

  /** Top subword symbols after the learned merges
    * ([[TextAnalysis.bpeSymbolCounts]]): where a tokenizer built from
    * q291's merges would spend its vocabulary budget.
    */
  val q292BpeSymbols = HarnessQuery(
    "q292_bpe_symbols",
    (spark, dir) =>
      TextAnalysis.bpeSymbolCounts(
        Tables.documents(spark, dir), "text", rounds = 3, k = 20)
        .orderBy(col("rank")),
    Some("""
      WITH v AS (SELECT w, count(*) AS f FROM (
               SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                 AS w
               FROM documents) GROUP BY 1),
      r0 AS (SELECT w, f,
               ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS repr
             FROM v),
      p1 AS (SELECT l, r, CAST(sum(f) AS BIGINT) AS c FROM (
               SELECT f, unnest(s[1:len(s)-1]) AS l,
                      unnest(s[2:len(s)]) AS r
               FROM (SELECT f, regexp_split_to_array(trim(repr), ' ') AS s
                     FROM r0)
               WHERE len(s) >= 2)
             GROUP BY 1, 2),
      w1 AS (SELECT l, r FROM p1
             QUALIFY row_number() OVER (ORDER BY c DESC, l, r) = 1),
      r1 AS (SELECT r0.w, r0.f,
               replace(r0.repr, ' ' || w1.l || ' ' || w1.r || ' ',
                 ' ' || w1.l || w1.r || ' ') AS repr
             FROM r0, w1),
      p2 AS (SELECT l, r, CAST(sum(f) AS BIGINT) AS c FROM (
               SELECT f, unnest(s[1:len(s)-1]) AS l,
                      unnest(s[2:len(s)]) AS r
               FROM (SELECT f, regexp_split_to_array(trim(repr), ' ') AS s
                     FROM r1)
               WHERE len(s) >= 2)
             GROUP BY 1, 2),
      w2 AS (SELECT l, r FROM p2
             QUALIFY row_number() OVER (ORDER BY c DESC, l, r) = 1),
      r2 AS (SELECT r1.w, r1.f,
               replace(r1.repr, ' ' || w2.l || ' ' || w2.r || ' ',
                 ' ' || w2.l || w2.r || ' ') AS repr
             FROM r1, w2),
      p3 AS (SELECT l, r, CAST(sum(f) AS BIGINT) AS c FROM (
               SELECT f, unnest(s[1:len(s)-1]) AS l,
                      unnest(s[2:len(s)]) AS r
               FROM (SELECT f, regexp_split_to_array(trim(repr), ' ') AS s
                     FROM r2)
               WHERE len(s) >= 2)
             GROUP BY 1, 2),
      w3 AS (SELECT l, r FROM p3
             QUALIFY row_number() OVER (ORDER BY c DESC, l, r) = 1),
      r3 AS (SELECT r2.w, r2.f,
               replace(r2.repr, ' ' || w3.l || ' ' || w3.r || ' ',
                 ' ' || w3.l || w3.r || ' ') AS repr
             FROM r2, w3),
      sym AS (SELECT symbol, CAST(sum(f) AS BIGINT) AS n_occurrences
              FROM (SELECT f, unnest(regexp_split_to_array(trim(repr), ' '))
                      AS symbol
                    FROM r3)
              GROUP BY 1)
      SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, symbol)
               AS BIGINT) AS rank,
             symbol, n_occurrences
      FROM sym
      QUALIFY rank <= 20
      ORDER BY rank
    """.trim))

  /** Train-on-sample, apply-everywhere BPE tokenization
    * ([[TextAnalysis.bpeEncode]]): 3 merges learned from the doc_id%7
    * slice (the bounded, inherently-sequential half), then applied to
    * the WHOLE corpus as one inlined chained-replace projection — no
    * shuffle, no driver loop. Per doc: whitespace word count vs subword
    * count under the trained merges. The oracle replays the q291
    * training CTE chain on the same sample, then the identical
    * non-overlapping replaces per word.
    */
  val q333BpeEncode = HarnessQuery(
    "q333_bpe_encode",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val merges = TextAnalysis.bpeMerges(
          docs.filter(pmod(col("doc_id"), lit(7L)) === 0), "text", 3)
        .orderBy(col("round"))
        .collect().toSeq // bounded: <= 3 rows of trained metadata
        .map(r => (r.getString(1), r.getString(2)))
      TextAnalysis.bpeEncode(docs, "text", "doc_id", merges)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH v AS (SELECT w, count(*) AS f FROM (
               SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                 AS w
               FROM documents WHERE doc_id % 7 = 0) GROUP BY 1),
      r0 AS (SELECT w, f,
               ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS repr
             FROM v),
      p1 AS (SELECT l, r, CAST(sum(f) AS BIGINT) AS c FROM (
               SELECT f, unnest(s[1:len(s)-1]) AS l,
                      unnest(s[2:len(s)]) AS r
               FROM (SELECT f, regexp_split_to_array(trim(repr), ' ') AS s
                     FROM r0)
               WHERE len(s) >= 2)
             GROUP BY 1, 2),
      w1 AS (SELECT l, r FROM p1
             QUALIFY row_number() OVER (ORDER BY c DESC, l, r) = 1),
      r1 AS (SELECT r0.w, r0.f,
               replace(r0.repr, ' ' || w1.l || ' ' || w1.r || ' ',
                 ' ' || w1.l || w1.r || ' ') AS repr
             FROM r0, w1),
      p2 AS (SELECT l, r, CAST(sum(f) AS BIGINT) AS c FROM (
               SELECT f, unnest(s[1:len(s)-1]) AS l,
                      unnest(s[2:len(s)]) AS r
               FROM (SELECT f, regexp_split_to_array(trim(repr), ' ') AS s
                     FROM r1)
               WHERE len(s) >= 2)
             GROUP BY 1, 2),
      w2 AS (SELECT l, r FROM p2
             QUALIFY row_number() OVER (ORDER BY c DESC, l, r) = 1),
      r2 AS (SELECT r1.w, r1.f,
               replace(r1.repr, ' ' || w2.l || ' ' || w2.r || ' ',
                 ' ' || w2.l || w2.r || ' ') AS repr
             FROM r1, w2),
      p3 AS (SELECT l, r, CAST(sum(f) AS BIGINT) AS c FROM (
               SELECT f, unnest(s[1:len(s)-1]) AS l,
                      unnest(s[2:len(s)]) AS r
               FROM (SELECT f, regexp_split_to_array(trim(repr), ' ') AS s
                     FROM r2)
               WHERE len(s) >= 2)
             GROUP BY 1, 2),
      w3 AS (SELECT l, r FROM p3
             QUALIFY row_number() OVER (ORDER BY c DESC, l, r) = 1),
      tok AS (SELECT doc_id,
                unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
              FROM documents WHERE text IS NOT NULL),
      enc AS (SELECT t.doc_id,
                replace(replace(replace(
                  ' ' || regexp_replace(t.w, '(.)', '\1 ', 'g'),
                  ' ' || w1.l || ' ' || w1.r || ' ',
                  ' ' || w1.l || w1.r || ' '),
                  ' ' || w2.l || ' ' || w2.r || ' ',
                  ' ' || w2.l || w2.r || ' '),
                  ' ' || w3.l || ' ' || w3.r || ' ',
                  ' ' || w3.l || w3.r || ' ') AS repr
              FROM tok t, w1, w2, w3)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(len(regexp_split_to_array(trim(repr), ' ')))
               AS BIGINT) AS n_bpe_tokens
      FROM enc GROUP BY 1 ORDER BY doc_id
    """.trim))

  /** BPE apply at REAL merge-table scale
    * ([[TextAnalysis.bpePhraseEncode]], 1024 ranks — far past
    * q333/bpeEncode's 64-literal cap): the merge table is the
    * frequency-ranked phrase table ([[TextAnalysis.phraseMergeTable]]
    * — every observed adjacent word pair, then every observed phrase
    * extension; this corpus yields the full 1024 at every shipped SF),
    * bound ONCE into the codegen'd
    * [[graft.functions.BpeTokenCountExpr]] and applied to the whole
    * corpus as one narrow shuffle-free projection — no driver loop,
    * no 10s-of-MB literal tree. The oracle replays all 1024
    * rank-ordered non-overlapping replaces per document via a bounded
    * recursive CTE joined on rank — the q291 replay pattern at 340x
    * the depth.
    */
  val q371BpePhrases = HarnessQuery(
    "q371_bpe_phrases",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val merges = TextAnalysis.phraseMergeTable(docs, "text", 1024)
        .orderBy(col("rank"))
        .collect().toSeq // bounded: <= 1024 rows of trained metadata
        .map(r => (r.getString(1), r.getString(2)))
      TextAnalysis.bpePhraseEncode(docs, "text", "doc_id", merges)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH RECURSIVE
      tok AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+')
                AS t
              FROM documents WHERE text IS NOT NULL),
      big AS (SELECT l, r, CAST(count(*) AS BIGINT) AS c, 1 AS lvl FROM (
                SELECT unnest(t[1:len(t)-1]) AS l, unnest(t[2:len(t)]) AS r
                FROM tok WHERE len(t) >= 2)
              GROUP BY 1, 2),
      tri AS (SELECT a || '_' || b AS l, cc AS r,
                     CAST(count(*) AS BIGINT) AS c, 2 AS lvl FROM (
                SELECT unnest(t[1:len(t)-2]) AS a,
                       unnest(t[2:len(t)-1]) AS b,
                       unnest(t[3:len(t)]) AS cc
                FROM tok WHERE len(t) >= 3)
              GROUP BY 1, 2),
      mg AS (SELECT l, r,
                    row_number() OVER (ORDER BY lvl, c DESC, l, r) AS rk
             FROM (SELECT * FROM big UNION ALL SELECT * FROM tri)
             QUALIFY rk <= 1024),
      enc(doc_id, repr, rk) AS (
        SELECT doc_id, ' ' || array_to_string(t, ' ') || ' ',
               CAST(0 AS BIGINT)
        FROM tok
        UNION ALL
        SELECT e.doc_id,
               replace(e.repr, ' ' || m.l || ' ' || m.r || ' ',
                               ' ' || m.l || '_' || m.r || ' '),
               e.rk + 1
        FROM enc e JOIN mg m ON m.rk = e.rk + 1),
      fin AS (SELECT doc_id, repr FROM enc
              WHERE rk = (SELECT max(rk) FROM mg))
      SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_words,
             CAST(len(regexp_split_to_array(trim(f.repr), ' ')) AS BIGINT)
               AS n_bpe_tokens
      FROM tok t JOIN fin f USING (doc_id) ORDER BY doc_id
    """.trim))

  /** BPE apply from a PERSISTED merge table
    * ([[graft.operators.TokenizerStore]]): q371's 1024-rank phrase
    * table is trained once, written to parquet, loaded back, and the
    * corpus is encoded with the LOADED artifact — the
    * train-once / tokenize-everywhere split (the q374 ANN-persistence
    * pattern applied to tokenizers; closes round 9's missing #4). The
    * oracle is q371's VERBATIM: strings and longs round-trip parquet
    * bit-exactly, so the loaded table must reproduce the fresh
    * encoding row-for-row.
    */
  val q401BpePersisted = HarnessQuery(
    "q401_bpe_persisted",
    (spark, dir) => {
      import graft.operators.TokenizerStore
      val docs = Tables.documents(spark, dir)
      val path = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_q401_bpe").getAbsolutePath
      TokenizerStore.saveMergeTable(
        TextAnalysis.phraseMergeTable(docs, "text", 1024), path)
      TextAnalysis.bpePhraseEncode(docs, "text", "doc_id",
        TokenizerStore.loadMergePairs(spark, path))
        .orderBy(col("doc_id"))
    },
    q371BpePhrases.oracle)

  /** Effective sample size ([[Mixture.effectiveSampleSize]]) of
    * length-proportional document weights per source — the usability
    * check on any importance-weighted resample.
    */
  val q293Ess = HarnessQuery(
    "q293_ess",
    (spark, dir) =>
      Mixture.effectiveSampleSize(
        Tables.documents(spark, dir)
          .withColumn("w", col("n_chars").cast("double")),
        "source", "w")
        .orderBy(col("source")),
    Some("""
      WITH d AS (SELECT source, CAST(n_chars AS DOUBLE) AS w
                 FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0),
      a AS (SELECT source, count(*) AS n,
              CAST(sum(CAST(floor(w * 1e6) / 1e6 AS DECIMAL(38,6)))
                   AS DOUBLE) AS s,
              CAST(sum(CAST(floor(w * w * 1e6) / 1e6 AS DECIMAL(38,6)))
                   AS DOUBLE) AS q
            FROM d GROUP BY 1)
      SELECT source, n,
             floor(s * s / q * 1e12) / 1e12 AS ess,
             floor(s * s / q / CAST(n AS DOUBLE) * 1e12) / 1e12 AS ess_ratio
      FROM a ORDER BY source
    """.trim))

  /** Embedding geometry / anisotropy audit
    * ([[Similarity.embeddingGeometry]]) per label.
    */
  val q294EmbeddingGeometry = HarnessQuery(
    "q294_embedding_geometry",
    (spark, dir) =>
      Similarity.embeddingGeometry(
        Tables.embeddings(spark, dir), "vec_id", "embedding", "label")
        .orderBy(col("label")),
    Some("""
      WITH mu AS (SELECT label, g.i AS d,
               CAST(sum(CAST(CAST(embedding[g.i] AS DOUBLE)
                    AS DECIMAL(30,12))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS m
             FROM embeddings, generate_series(1, 64) g(i) GROUP BY 1, 2),
      mu2 AS (SELECT label,
                CAST(sum(CAST(round(m * m, 12) AS DECIMAL(38,12)))
                     AS DOUBLE) AS mu2
              FROM mu GROUP BY 1),
      n2 AS (SELECT label, vec_id,
               CAST(sum(CAST(CAST(embedding[g.i] AS DOUBLE)
                    * CAST(embedding[g.i] AS DOUBLE) AS DECIMAL(30,18)))
                    AS DOUBLE) AS n2
             FROM embeddings, generate_series(1, 64) g(i) GROUP BY 1, 2),
      st AS (SELECT label, count(*) AS n,
               CAST(sum(CAST(round(n2, 12) AS DECIMAL(38,12))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS en2,
               CAST(sum(CAST(round(sqrt(n2), 12) AS DECIMAL(38,12)))
                    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mn
             FROM n2 GROUP BY 1)
      SELECT st.label, st.n,
             floor(mn * 1e10) / 1e10 AS mean_norm,
             floor(mu2.mu2 / en2 * 1e10) / 1e10 AS anisotropy
      FROM st JOIN mu2 USING (label) ORDER BY label
    """.trim))

  val all: Seq[HarnessQuery] = Seq(
    q264NaiveBayes, q265LogisticGd, q266DecisionStump, q267FdAudit, q268Acf,
    q269CmsAudit, q270BoostedStumps, q272Neyman, q273Hits,
    q274NearestCentroid, q275TrigramLm, q276Huber, q277Kmv, q416KmvSetOps,
    q417QualityClassifier, q444ClassifierPersisted,
    q278Decompose,
    q279TCloseness, q280Silhouette, q281Ndcg, q282Rendezvous, q283EbShrink,
    q284Als, q285SentenceStats, q286Sortedness, q287Flesch, q288NbFeatures,
    q289BinaryIngest, q290PitEnrich, q291Bpe, q292BpeSymbols, q293Ess,
    q294EmbeddingGeometry, q333BpeEncode, q371BpePhrases,
    q401BpePersisted)
}

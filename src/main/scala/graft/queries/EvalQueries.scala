package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Encoding, Evaluation, Expectations}
import graft.sources.Tables

/** Model-evaluation, supervised-encoding and data-quality queries — the
  * read-out layer of the fraud pipeline (the sklearn
  * `classification_report`/AUC step after `processor.py`'s prep, the
  * credit-scorecard WOE/IV/PSI extensions of `transform_data.py`'s
  * one-hot stop, and the formalized expectations gate over
  * `clean_data.py`'s ad-hoc null checks).
  *
  * The scored frame is a deterministic derivation over `events`
  * (arithmetic only — both engines compute bit-identical doubles):
  * label = event_id % 10 == 0, score = ((event_id·7919 + user_id) mod
  * 700)/999 + 0.3·label — ~1400 distinct scores with ~7-way ties, so
  * the tie handling of the rank/AUC machinery is actually exercised.
  * ln()-derived metrics round to 12 to absorb libm ulp tails; all other
  * ratios are single correctly-rounded integer divisions.
  */
object EvalQueries {

  private def scored(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"), col("user_id"),
      when(pmod(col("event_id"), lit(10L)) === 0, 1L).otherwise(0L).as("label"))
      .withColumn("score",
        pmod(col("event_id") * lit(7919L) + col("user_id"), lit(700L))
          .cast("double") / lit(999.0) + col("label") * lit(0.3))

  private val scoredSql = """
      scored AS (
        SELECT event_id, user_id,
               CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END AS label,
               CAST((event_id * 7919 + user_id) % 700 AS DOUBLE) / 999.0
                 + (CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END) * 0.3 AS score
        FROM events),
      per AS (
        SELECT score,
               CAST(sum(label) AS BIGINT) AS pos_c,
               CAST(count(*) - sum(label) AS BIGINT) AS neg_c
        FROM scored GROUP BY score),
      tot AS (
        SELECT CAST(sum(pos_c) AS BIGINT) AS p, CAST(sum(neg_c) AS BIGINT) AS n
        FROM per)"""

  /** Exact tie-aware ROC AUC (Mann–Whitney pair counting — all integer
    * until one final division).
    */
  val q149RocAuc = HarnessQuery(
    "q149_roc_auc",
    (spark, dir) =>
      Evaluation.rocAuc(scored(spark, dir), "score", "label")
        .withColumn("auc", round(col("auc"), 12)),
    Some(s"""
      WITH $scoredSql,
      cum AS (
        SELECT *,
               coalesce(sum(neg_c) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_neg_lt
        FROM per)
      SELECT round(CAST(sum(CAST(pos_c AS HUGEINT)
                              * (2 * cum_neg_lt + neg_c)) AS DOUBLE)
               / (2.0 * (SELECT p FROM tot) * (SELECT n FROM tot)), 12) AS auc,
             (SELECT p FROM tot) AS n_pos,
             (SELECT n FROM tot) AS n_neg
      FROM cum
    """.trim))

  /** Kolmogorov–Smirnov separation statistic + the smallest score
    * attaining it (the natural alert threshold).
    */
  val q150KsStat = HarnessQuery(
    "q150_ks_stat",
    (spark, dir) =>
      Evaluation.ksStatistic(scored(spark, dir), "score", "label")
        .withColumn("ks", round(col("ks"), 12)),
    Some(s"""
      WITH $scoredSql,
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
                  * CAST((SELECT n FROM tot) AS DOUBLE)), 12)
               AS ks,
             score AS ks_score
      FROM cum
      ORDER BY abs(CAST(cp AS HUGEINT) * (SELECT n FROM tot)
                 - CAST(cn AS HUGEINT) * (SELECT p FROM tot)) DESC,
               score ASC
      LIMIT 1
    """.trim))

  /** Confusion matrix + precision/recall/F1/accuracy at threshold 0.5
    * (exact small-integer divisions — no rounding needed).
    */
  val q151Confusion = HarnessQuery(
    "q151_confusion",
    (spark, dir) =>
      Evaluation.confusionAtThreshold(scored(spark, dir), "score", "label", 0.5),
    Some("""
      WITH scored AS (
        SELECT CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END AS label,
               CAST((event_id * 7919 + user_id) % 700 AS DOUBLE) / 999.0
                 + (CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END) * 0.3 AS score
        FROM events),
      c AS (
        SELECT
          CAST(sum(CASE WHEN score >= 0.5 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
          CAST(sum(CASE WHEN score >= 0.5 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
          CAST(sum(CASE WHEN score < 0.5 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
          CAST(sum(CASE WHEN score < 0.5 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
        FROM scored)
      SELECT tp, fp, tn, fn,
             CAST(tp AS DOUBLE) / (tp + fp) AS precision,
             CAST(tp AS DOUBLE) / (tp + fn) AS recall,
             2.0 * tp / (2 * tp + fp + fn) AS f1,
             CAST(tp + tn AS DOUBLE) / (tp + fp + tn + fn) AS accuracy
      FROM c
    """.trim))

  /** Reliability-diagram bins: per equal-width score bin the count,
    * exact mean score and observed positive rate.
    */
  val q152Calibration = HarnessQuery(
    "q152_calibration",
    (spark, dir) =>
      Evaluation.calibrationBins(scored(spark, dir), "score", "label", bins = 10)
        .withColumn("bin", col("bin").cast("long")),
    Some("""
      WITH scored AS (
        SELECT CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END AS label,
               CAST((event_id * 7919 + user_id) % 700 AS DOUBLE) / 999.0
                 + (CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END) * 0.3 AS score
        FROM events)
      SELECT CAST(GREATEST(0, LEAST(9, CAST(floor(score * 10) AS INT))) AS BIGINT)
               AS bin,
             count(*) AS n,
             CAST(sum(CAST(score AS DECIMAL(28,10))) AS DOUBLE) / count(*)
               AS mean_score,
             CAST(sum(label) AS DOUBLE) / count(*) AS pos_rate
      FROM scored GROUP BY 1 ORDER BY 1
    """.trim))

  /** Decile lift/gain table through the skew-safe two-level rank (no
    * whole-corpus window): per tile size, positives, cumulative capture
    * and lift.
    */
  val q153LiftTable = HarnessQuery(
    "q153_lift_table",
    (spark, dir) =>
      Evaluation.liftTable(scored(spark, dir), "score", "label",
        tieBreak = Seq("event_id"), tiles = 10)
        .withColumn("tile", col("tile").cast("long")),
    Some("""
      WITH scored AS (
        SELECT event_id,
               CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END AS label,
               CAST((event_id * 7919 + user_id) % 700 AS DOUBLE) / 999.0
                 + (CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END) * 0.3 AS score
        FROM events),
      ranked AS (
        SELECT label,
               CAST(ceil(row_number() OVER (ORDER BY score DESC, event_id ASC)
                 * 10 / (SELECT count(*) FROM scored)) AS BIGINT) AS tile
        FROM scored),
      per AS (
        SELECT tile, count(*) AS n, CAST(sum(label) AS BIGINT) AS n_pos
        FROM ranked GROUP BY tile),
      tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(n_pos) AS BIGINT) AS p
        FROM per)
      SELECT tile, n, n_pos,
             CAST(sum(n_pos) OVER (ORDER BY tile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / (SELECT p FROM tot) AS cum_capture,
             CAST(n_pos * (SELECT nn FROM tot) AS DOUBLE)
               / (n * (SELECT p FROM tot)) AS lift
      FROM per ORDER BY tile
    """.trim))

  /** Weight-of-evidence / information-value table per event_type
    * against the deterministic label.
    */
  val q154WoeIv = HarnessQuery(
    "q154_woe_iv",
    (spark, dir) =>
      Encoding.woeIv(
        Tables.events(spark, dir).withColumn("label",
          when(pmod(col("event_id"), lit(10L)) === 0, 1L).otherwise(0L)),
        "event_type", "label")
        .withColumn("woe", round(col("woe"), 12))
        .withColumn("iv_term", round(col("iv_term"), 12))
        .orderBy(col("event_type")),
    Some("""
      WITH lab AS (
        SELECT event_type,
               CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END AS label
        FROM events),
      per AS (
        SELECT event_type,
               CAST(sum(label) AS BIGINT) AS pos_c,
               CAST(count(*) - sum(label) AS BIGINT) AS neg_c
        FROM lab GROUP BY 1),
      tot AS (
        SELECT CAST(sum(pos_c) AS BIGINT) AS p, CAST(sum(neg_c) AS BIGINT) AS n
        FROM per)
      SELECT event_type, pos_c, neg_c,
             round(ln(((pos_c + 0.5) / (SELECT p FROM tot))
               / ((neg_c + 0.5) / (SELECT n FROM tot))), 12) AS woe,
             round((CAST(pos_c AS DOUBLE) / (SELECT p FROM tot)
                 - CAST(neg_c AS DOUBLE) / (SELECT n FROM tot))
               * ln(((pos_c + 0.5) / (SELECT p FROM tot))
                 / ((neg_c + 0.5) / (SELECT n FROM tot))), 12) AS iv_term
      FROM per ORDER BY event_type
    """.trim))

  /** Leakage-safe out-of-fold target encoding: per (category, fold) the
    * mean label over the OTHER folds — md5 fold membership replays
    * exactly in SQL, so this pins the full encoding table.
    */
  val q155TargetEncode = HarnessQuery(
    "q155_target_encode",
    (spark, dir) =>
      Encoding.targetEncodeOOF(
        Tables.events(spark, dir).withColumn("label",
          when(pmod(col("event_id"), lit(10L)) === 0, 1L).otherwise(0L)),
        "event_type", "label", idCol = "user_id", k = 5, seed = 42L)
        .withColumn("enc", round(col("enc"), 12))
        .orderBy(col("event_type"), col("fold")),
    Some("""
      WITH lab AS (
        SELECT event_type,
               CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END AS label,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':42'), 1, 15))
                 AS BIGINT) % 5 AS fold
        FROM events),
      cell AS (
        SELECT event_type, fold,
               CAST(sum(label) AS BIGINT) AS s, count(*) AS n
        FROM lab GROUP BY 1, 2),
      cat AS (
        SELECT event_type,
               CAST(sum(s) AS BIGINT) AS cs, CAST(sum(n) AS BIGINT) AS cn
        FROM cell GROUP BY 1),
      gtot AS (
        SELECT CAST(sum(s) AS BIGINT) AS gs, CAST(sum(n) AS BIGINT) AS gn
        FROM cell)
      SELECT event_type, cell.fold,
             round(CASE WHEN cat.cn > cell.n
               THEN CAST(cat.cs - cell.s AS DOUBLE) / (cat.cn - cell.n)
               ELSE CAST((SELECT gs FROM gtot) - cell.s AS DOUBLE)
                    / ((SELECT gn FROM gtot) - cell.n) END, 12) AS enc
      FROM cell JOIN cat USING (event_type)
      ORDER BY event_type, fold
    """.trim))

  /** Population-stability index between even/odd event slices of
    * `value` (the null drift case — the two slices are statistically
    * identical, so the PSI terms hover near zero).
    */
  val q156Psi = HarnessQuery(
    "q156_psi",
    (spark, dir) =>
      Encoding.psi(
        Tables.events(spark, dir)
          .withColumn("slice", pmod(col("event_id"), lit(2L))),
        "value", "slice", lo = 0.0, hi = 500.0, bins = 10)
        .withColumn("psi_term", round(col("psi_term"), 12)),
    Some("""
      WITH sliced AS (
        SELECT event_id % 2 AS slice,
               CAST(GREATEST(0, LEAST(9, CAST(floor(("value" - 0.0) / 50.0)
                 AS INT))) AS INT) AS bin
        FROM events),
      per AS (
        SELECT bin,
               CAST(sum(CASE WHEN slice = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_expected,
               CAST(sum(CASE WHEN slice = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_actual
        FROM sliced GROUP BY 1),
      tot AS (
        SELECT CAST(sum(n_expected) AS BIGINT) AS e,
               CAST(sum(n_actual) AS BIGINT) AS a
        FROM per)
      SELECT bin, n_expected, n_actual,
             (n_expected + 0.5) / ((SELECT e FROM tot) + 0.5 * 10) AS p_expected,
             (n_actual + 0.5) / ((SELECT a FROM tot) + 0.5 * 10) AS p_actual,
             round(((n_actual + 0.5) / ((SELECT a FROM tot) + 0.5 * 10)
                 - (n_expected + 0.5) / ((SELECT e FROM tot) + 0.5 * 10))
               * ln(((n_actual + 0.5) / ((SELECT a FROM tot) + 0.5 * 10))
                 / ((n_expected + 0.5) / ((SELECT e FROM tot) + 0.5 * 10))), 12)
               AS psi_term
      FROM per ORDER BY bin
    """.trim))

  /** Declarative expectations gate over events: five checks compiled
    * into one aggregation pass (the user_id uniqueness check is the
    * deliberately-failing row — a gate that can't fail proves nothing).
    */
  val q157Expectations = HarnessQuery(
    "q157_expectations",
    (spark, dir) =>
      Expectations.audit(Tables.events(spark, dir), Seq(
        Expectations.NotNull("value", 0.0),
        Expectations.InRange("value", 0.0, 500.0, 0.99),
        Expectations.Unique("event_id", 1.0),
        Expectations.Unique("user_id", 1.0),
        Expectations.InSet("event_type",
          Seq("click", "view", "purchase", "error"), 0.75))),
    Some("""
      SELECT * FROM (
        SELECT 'not_null' AS "check", 'value' AS "column",
               (SELECT CAST(sum(CASE WHEN "value" IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) FROM events) AS observed,
               0.0 AS threshold,
               (SELECT CAST(sum(CASE WHEN "value" IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) <= 0.0 FROM events) AS pass
        UNION ALL
        SELECT 'in_range', 'value',
               (SELECT CAST(sum(CASE WHEN "value" >= 0.0 AND "value" <= 500.0
                  THEN 1 ELSE 0 END) AS DOUBLE)
                  / sum(CASE WHEN "value" IS NOT NULL THEN 1 ELSE 0 END)
                FROM events),
               0.99,
               (SELECT CAST(sum(CASE WHEN "value" >= 0.0 AND "value" <= 500.0
                  THEN 1 ELSE 0 END) AS DOUBLE)
                  / sum(CASE WHEN "value" IS NOT NULL THEN 1 ELSE 0 END) >= 0.99
                FROM events)
        UNION ALL
        SELECT 'unique', 'event_id',
               (SELECT CAST(count(DISTINCT event_id) AS DOUBLE) / count(*)
                FROM events),
               1.0,
               (SELECT CAST(count(DISTINCT event_id) AS DOUBLE) / count(*) >= 1.0
                FROM events)
        UNION ALL
        SELECT 'unique', 'user_id',
               (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) / count(*)
                FROM events),
               1.0,
               (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) / count(*) >= 1.0
                FROM events)
        UNION ALL
        SELECT 'in_set', 'event_type',
               (SELECT CAST(sum(CASE WHEN event_type IN
                  ('click', 'view', 'purchase', 'error') THEN 1 ELSE 0 END)
                  AS DOUBLE)
                  / sum(CASE WHEN event_type IS NOT NULL THEN 1 ELSE 0 END)
                FROM events),
               0.75,
               (SELECT CAST(sum(CASE WHEN event_type IN
                  ('click', 'view', 'purchase', 'error') THEN 1 ELSE 0 END)
                  AS DOUBLE)
                  / sum(CASE WHEN event_type IS NOT NULL THEN 1 ELSE 0 END)
                  >= 0.75 FROM events)
      ) ORDER BY "check", "column"
    """.trim))

  /** The shared cumulative machinery itself: one row per distinct score
    * with exact pos/neg counts and cumulative counts — the table AUC,
    * KS and lift all derive from.
    */
  val q158CumScores = HarnessQuery(
    "q158_cum_scores",
    (spark, dir) =>
      Evaluation.cumulativeByScore(scored(spark, dir), "score", "label",
        buckets = 8),
    Some(s"""
      WITH $scoredSql
      SELECT score, pos_c, neg_c,
             CAST(sum(pos_c) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_pos_le,
             CAST(sum(neg_c) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_neg_le
      FROM per ORDER BY score
    """.trim))

  def all: Seq[HarnessQuery] = Seq(
    q149RocAuc, q150KsStat, q151Confusion, q152Calibration, q153LiftTable,
    q154WoeIv, q155TargetEncode, q156Psi, q157Expectations, q158CumScores,
    q226CvAuc, q236ThresholdSweep)

  /** Cross-validated AUC ([[Evaluation.rocAucByGroup]] over
    * [[graft.operators.Split.groupKFold]] folds): one tie-aware
    * Mann-Whitney AUC per fold in a single pass — the per-group
    * cumulative window runs over the per-(fold, score) aggregate,
    * bounded by distinct scores, never raw rows.
    */
  lazy val q226CvAuc = HarnessQuery(
    "q226_cv_auc",
    (spark, dir) =>
      Evaluation.rocAucByGroup(
        graft.operators.Split.groupKFold(
          scored(spark, dir), "user_id", 5, 42L),
        "score", "label", "fold")
        .withColumn("auc", round(col("auc"), 12))
        .orderBy(col("fold")),
    Some(s"""
      WITH $scoredSql,
      f AS (
        SELECT scored.*,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':42'), 1, 15))
                 AS BIGINT) % 5 AS fold
        FROM scored),
      perf AS (
        SELECT fold, score,
               CAST(sum(label) AS BIGINT) AS pos_c,
               CAST(count(*) - sum(label) AS BIGINT) AS neg_c
        FROM f GROUP BY 1, 2),
      cum AS (
        SELECT *,
               coalesce(sum(neg_c) OVER (PARTITION BY fold ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnl
        FROM perf),
      a AS (
        SELECT fold,
               sum(CAST(pos_c AS HUGEINT) * (2 * cnl + neg_c)) AS num,
               CAST(sum(pos_c) AS BIGINT) AS n_pos,
               CAST(sum(neg_c) AS BIGINT) AS n_neg
        FROM cum GROUP BY 1)
      SELECT fold, n_pos, n_neg,
             round(CAST(num AS DOUBLE) / nullif(2.0 * n_pos * n_neg, 0), 12)
               AS auc
      FROM a ORDER BY fold
    """.trim))

  /** Operating-point curve ([[Evaluation.thresholdSweep]], 9
    * thresholds): every confusion metric at every candidate threshold
    * in ONE scan (in-row threshold explode into the conditional
    * aggregate), the deployment-threshold picker.
    */
  lazy val q236ThresholdSweep = HarnessQuery(
    "q236_threshold_sweep",
    (spark, dir) =>
      Evaluation.thresholdSweep(
        scored(spark, dir), "score", "label",
        (1 to 9).map(_ / 10.0))
        .orderBy(col("threshold")),
    Some(s"""
      WITH $scoredSql,
      x AS (
        SELECT score, label,
               CAST(unnest([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
                 AS DOUBLE) AS threshold
        FROM scored),
      cm AS (
        SELECT threshold,
               CAST(sum(CASE WHEN score >= threshold AND label = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(sum(CASE WHEN score >= threshold AND label = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN score < threshold AND label = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
               CAST(sum(CASE WHEN score < threshold AND label = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS fn
        FROM x GROUP BY 1)
      SELECT threshold, tp, fp, tn, fn,
             CAST(tp AS DOUBLE) / nullif(CAST(tp + fp AS DOUBLE), 0)
               AS precision,
             CAST(tp AS DOUBLE) / nullif(CAST(tp + fn AS DOUBLE), 0)
               AS recall,
             2.0 * tp / nullif(CAST(2 * tp + fp + fn AS DOUBLE), 0) AS f1
      FROM cm ORDER BY threshold
    """.trim))
}

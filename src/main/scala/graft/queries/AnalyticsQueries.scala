package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Eda, EventAnalytics}
import graft.sources.Tables

/** Product-analytics queries over the events log: cohort retention and
  * ordered funnel conversion ([[EventAnalytics]]).
  */
object AnalyticsQueries {

  /** Day-granularity cohort retention matrix
    * ([[EventAnalytics.cohortRetention]]) — integer epoch-day
    * arithmetic on both engines, so the matrix hash-pins exactly.
    */
  val q168CohortRetention = HarnessQuery(
    "q168_cohort_retention",
    (spark, dir) =>
      EventAnalytics.cohortRetention(
        Tables.events(spark, dir), "user_id", "ts")
        .orderBy(col("cohort_day"), col("day_offset")),
    Some("""
      WITH ad AS (
        SELECT DISTINCT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        FROM events),
      co AS (SELECT user_id, min(day) AS cohort FROM ad GROUP BY 1)
      SELECT co.cohort AS cohort_day, ad.day - co.cohort AS day_offset,
             CAST(count(DISTINCT ad.user_id) AS BIGINT) AS n_active
      FROM ad JOIN co USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2
    """.trim))

  /** First-touch ordered funnel ([[EventAnalytics.funnel]]) over
    * view → click → purchase: per step, entities whose FIRST
    * occurrences are strictly time-ordered through that step.
    */
  val q169Funnel = HarnessQuery(
    "q169_funnel",
    (spark, dir) =>
      EventAnalytics.funnel(
        Tables.events(spark, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase")),
    Some("""
      WITH f AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view'
                 THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t0,
               min(CASE WHEN event_type = 'click'
                 THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t1,
               min(CASE WHEN event_type = 'purchase'
                 THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t2
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
        GROUP BY 1)
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
               CAST(sum(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_entities
        FROM f
        UNION ALL
        SELECT 2, 'click',
               CAST(sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL
                 AND t0 < t1 THEN 1 ELSE 0 END) AS BIGINT)
        FROM f
        UNION ALL
        SELECT 3, 'purchase',
               CAST(sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL
                 AND t0 < t1 AND t2 IS NOT NULL AND t1 < t2
                 THEN 1 ELSE 0 END) AS BIGINT)
        FROM f)
      ORDER BY step_idx
    """.trim))

  /** Last-touch attribution ([[EventAnalytics.lastTouchAttribution]]):
    * purchase value credited to the most recent preceding
    * non-purchase event type per user; both engines evaluate
    * last-ignore-nulls over the identical (ts, event_id) frame.
    */
  val q170Attribution = HarnessQuery(
    "q170_attribution",
    (spark, dir) =>
      EventAnalytics.lastTouchAttribution(
        Tables.events(spark, dir), "user_id", "ts", "event_id",
        "event_type", "value", conversionEvent = "purchase")
        .orderBy(col("channel")),
    Some("""
      WITH t AS (
        SELECT user_id, event_type, "value",
               last_value(CASE WHEN event_type <> 'purchase'
                 THEN event_type END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS touch
        FROM events)
      SELECT coalesce(touch, 'direct') AS channel,
             count(*) AS n_conversions,
             CAST(sum(CAST("value" AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      FROM t WHERE event_type = 'purchase'
      GROUP BY 1 ORDER BY 1
    """.trim))

  /** Exact percentile bands ([[Eda.percentileBands]]): Spark's
    * interpolating `percentile` and DuckDB's `quantile_cont` compute
    * the same statistic — probed bit-identical on this data; round(9)
    * guards the interpolation's last ulp.
    */
  val q171PercentileBands = HarnessQuery(
    "q171_percentile_bands",
    (spark, dir) =>
      Eda.percentileBands(
        Tables.lineitem(spark, dir), "l_returnflag", "l_extendedprice",
        Seq(0.25, 0.5, 0.75, 0.9))
        .orderBy(col("l_returnflag")),
    Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.25), 9) AS p25,
             round(quantile_cont(l_extendedprice, 0.5), 9) AS p50,
             round(quantile_cont(l_extendedprice, 0.75), 9) AS p75,
             round(quantile_cont(l_extendedprice, 0.9), 9) AS p90
      FROM lineitem GROUP BY 1 ORDER BY 1
    """.trim))

  /** Time-weighted average value per user
    * ([[EventAnalytics.timeWeightedAverage]]): integer-microsecond
    * dwell weights, decimal accumulation. The final ratio rounds to 9:
    * the numerator/denominator decimals agree exactly across engines,
    * but DuckDB folds cast-to-double + divide into a higher-precision
    * decimal division (correctly rounded), while Spark divides two
    * rounded doubles — a 1-2 ulp tail round(9) absorbs.
    */
  val q172Twap = HarnessQuery(
    "q172_twap",
    (spark, dir) =>
      EventAnalytics.timeWeightedAverage(
        Tables.events(spark, dir), "user_id", "ts", "event_id", "value")
        .withColumn("twap", round(col("twap"), 9))
        .orderBy(col("user_id")),
    Some("""
      WITH t AS (
        SELECT user_id,
               CAST("value" AS DECIMAL(18,6)) AS v,
               lead(epoch_us(CAST(ts AS TIMESTAMP)), 1)
                 OVER (PARTITION BY user_id
                       ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
                 - epoch_us(CAST(ts AS TIMESTAMP)) AS dwell
        FROM events)
      SELECT user_id,
             CAST(count(dwell) AS BIGINT) AS n_weighted,
             CAST(sum(dwell) AS BIGINT) AS dwell_us_total,
             round(CAST(sum(v * CAST(dwell AS DECIMAL(19,0))) AS DOUBLE)
               / CAST(sum(dwell) AS DOUBLE), 9) AS twap
      FROM t GROUP BY 1 ORDER BY 1
    """.trim))

  /** Behavioral entropy per user
    * ([[EventAnalytics.behavioralEntropy]]) over the fixed event-type
    * alphabet — the oracle evaluates the identical left-associated
    * p·ln p chain, so the ln-derived value matches at round(12).
    */
  val q177Entropy = HarnessQuery(
    "q177_entropy",
    (spark, dir) =>
      EventAnalytics.behavioralEntropy(
        Tables.events(spark, dir), "user_id", "event_type",
        Seq("click", "view", "purchase", "error"))
        .withColumn("entropy", round(col("entropy"), 12))
        .orderBy(col("user_id")),
    Some("""
      WITH c AS (
        SELECT user_id, count(*) AS n,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS c3,
               CAST(sum(CASE WHEN event_type NOT IN ('click', 'view', 'purchase', 'error')
                 THEN 1 ELSE 0 END) AS BIGINT) AS c4
        FROM events GROUP BY 1)
      SELECT user_id, n,
             round(-((CASE WHEN c0 > 0 THEN (CAST(c0 AS DOUBLE) / n) * ln(CAST(c0 AS DOUBLE) / n) ELSE 0.0 END)
                   + (CASE WHEN c1 > 0 THEN (CAST(c1 AS DOUBLE) / n) * ln(CAST(c1 AS DOUBLE) / n) ELSE 0.0 END)
                   + (CASE WHEN c2 > 0 THEN (CAST(c2 AS DOUBLE) / n) * ln(CAST(c2 AS DOUBLE) / n) ELSE 0.0 END)
                   + (CASE WHEN c3 > 0 THEN (CAST(c3 AS DOUBLE) / n) * ln(CAST(c3 AS DOUBLE) / n) ELSE 0.0 END)
                   + (CASE WHEN c4 > 0 THEN (CAST(c4 AS DOUBLE) / n) * ln(CAST(c4 AS DOUBLE) / n) ELSE 0.0 END)), 12)
               AS entropy
      FROM c ORDER BY user_id
    """.trim))

  /** Per-segment Gini concentration of line revenue
    * ([[graft.operators.Inequality.giniByGroup]]): the operator's
    * tied-block closed form equals ANY row_number assignment among
    * equal values, so the oracle uses the naive per-partition
    * row_number — every term an exact decimal product, one double
    * division per group.
    */
  val q243Gini = HarnessQuery(
    "q243_gini",
    (spark, dir) =>
      graft.operators.Inequality.giniByGroup(
        Tables.lineitem(spark, dir), "l_returnflag", "l_extendedprice")
        .select(col("l_returnflag"), col("n"),
          round(col("total"), 6).as("total"),
          round(col("gini"), 12).as("gini")),
    Some("""
      WITH t AS (
        SELECT l_returnflag,
               CAST(l_extendedprice AS DECIMAL(18,6)) AS v
        FROM lineitem WHERE l_extendedprice IS NOT NULL),
      r AS (
        SELECT l_returnflag, v,
               CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY v)
                 AS BIGINT) AS i
        FROM t),
      a AS (
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS DECIMAL(28,6)) AS s,
               sum(v * CAST(2 * i AS DECIMAL(20,0))) AS s2i
        FROM r GROUP BY 1)
      SELECT l_returnflag, n, round(CAST(s AS DOUBLE), 6) AS total,
             round(CAST(s2i - CAST(n + 1 AS DECIMAL(10,0)) * s AS DOUBLE)
               / CAST(CAST(n AS DECIMAL(10,0)) * s AS DOUBLE), 12) AS gini
      FROM a ORDER BY l_returnflag
    """.trim))

  /** Per-segment OLS of revenue on quantity
    * ([[graft.operators.Experiment.olsByGroup]]): five exact decimal
    * moments per group in one aggregate, double ratios at the end —
    * slope/intercept/R² rounded at 9 (the ratio-of-decimal-casts
    * contract).
    */
  val q251Ols = HarnessQuery(
    "q251_ols",
    (spark, dir) =>
      graft.operators.Experiment.olsByGroup(
        Tables.lineitem(spark, dir), "l_returnflag",
        "l_quantity", "l_extendedprice")
        .select(col("l_returnflag"), col("n"),
          round(col("slope"), 9).as("slope"),
          round(col("intercept"), 9).as("intercept"),
          round(col("r2"), 9).as("r2")),
    Some("""
      WITH t AS (
        SELECT l_returnflag,
               CAST(l_quantity AS DECIMAL(19,6)) AS x,
               CAST(l_extendedprice AS DECIMAL(19,6)) AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      m AS (
        SELECT l_returnflag,
               CAST(count(*) AS DECIMAL(10,0)) AS n,
               CAST(sum(x) AS DECIMAL(19,6)) AS sx,
               CAST(sum(y) AS DECIMAL(19,6)) AS sy,
               CAST(sum(x * y) AS DECIMAL(28,12)) AS sxy,
               CAST(sum(x * x) AS DECIMAL(28,12)) AS sxx,
               CAST(sum(y * y) AS DECIMAL(28,12)) AS syy
        FROM t GROUP BY 1),
      d AS (
        SELECT l_returnflag, n,
               CAST(n * sxy - sx * sy AS DOUBLE) AS num,
               CAST(n * sxx - sx * sx AS DOUBLE) AS denx,
               CAST(n * syy - sy * sy AS DOUBLE) AS deny,
               CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        FROM m)
      SELECT l_returnflag, CAST(n AS BIGINT) AS n,
             round(CASE WHEN denx > 0 THEN num / denx END, 9) AS slope,
             round(CASE WHEN denx > 0 THEN
               (syd - (num / denx) * sxd) / CAST(n AS DOUBLE) END, 9)
               AS intercept,
             round(CASE WHEN denx > 0 AND deny > 0 THEN
               num * num / (denx * deny) END, 9) AS r2
      FROM d ORDER BY l_returnflag
    """.trim))

  /** Quantity-weighted median line price per return flag
    * ([[graft.operators.RankStats.weightedMedianByGroup]]): the
    * threshold test 2·cumweight >= total runs in exact decimal, so
    * both engines pick the identical crossing value.
    */
  val q257WeightedMedian = HarnessQuery(
    "q257_weighted_median",
    (spark, dir) =>
      graft.operators.RankStats.weightedMedianByGroup(
        Tables.lineitem(spark, dir), "l_returnflag",
        "l_extendedprice", "l_quantity"),
    Some("""
      WITH per AS (
        SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v,
               count(*) AS c,
               sum(CAST(l_quantity AS DECIMAL(18,6))) AS w
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        GROUP BY 1, 2),
      cum AS (
        SELECT l_returnflag, v,
               CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DECIMAL(28,6)) AS cw
        FROM per),
      tot AS (
        SELECT l_returnflag, CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(w) AS DECIMAL(28,6)) AS tw
        FROM per GROUP BY 1)
      SELECT t.l_returnflag, t.n, CAST(t.tw AS DOUBLE) AS total_weight,
             min(c2.v) AS weighted_median
      FROM tot t JOIN cum c2
        ON t.l_returnflag = c2.l_returnflag AND c2.cw * 2 >= t.tw
      GROUP BY 1, 2, 3 ORDER BY 1
    """.trim))

  /** Hill tail-index of the event-value distribution
    * ([[graft.operators.NumericFeatures.hillTailIndex]], k = 100):
    * global top-(k+1) via TakeOrdered, round-12 ln terms in decimal.
    */
  val q262Hill = HarnessQuery(
    "q262_hill",
    (spark, dir) =>
      graft.operators.NumericFeatures.hillTailIndex(
        Tables.events(spark, dir), "value", k = 100)
        .withColumn("alpha", round(col("alpha"), 9)),
    Some("""
      WITH top AS (
        SELECT CAST("value" AS DOUBLE) AS v FROM events
        WHERE "value" IS NOT NULL AND "value" > 0
        ORDER BY v DESC LIMIT 101),
      r AS (SELECT v, row_number() OVER (ORDER BY v DESC) AS rk FROM top),
      x AS (SELECT v AS xk1 FROM r WHERE rk = 101),
      t AS (
        SELECT CAST(round(ln(r.v / (SELECT xk1 FROM x)), 12)
          AS DECIMAL(38,12)) AS t
        FROM r WHERE rk <= 100)
      SELECT CAST(100 AS BIGINT) AS k,
             (SELECT xk1 FROM x) AS x_kplus1,
             round(100.0 / CAST(sum(t) AS DOUBLE), 9) AS alpha
      FROM t
    """.trim))

  /** Per-type VaR / expected shortfall
    * ([[graft.operators.NumericFeatures.cvarByGroup]], q = 0.95):
    * exact interpolated quantile, decimal tail means.
    */
  val q263Cvar = HarnessQuery(
    "q263_cvar",
    (spark, dir) =>
      graft.operators.NumericFeatures.cvarByGroup(
        Tables.events(spark, dir), "event_type", "value", q = 0.95)
        .select(col("event_type"), col("n"),
          round(col("var_q"), 9).as("var_q"), col("n_tail"),
          round(col("cvar"), 9).as("cvar")),
    Some("""
      WITH c AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               quantile_cont("value", 0.95) AS var_q
        FROM events WHERE "value" IS NOT NULL GROUP BY 1)
      SELECT e.event_type, max(c.n) AS n,
             round(max(c.var_q), 9) AS var_q,
             CAST(sum(CASE WHEN CAST(e."value" AS DOUBLE) >= c.var_q
               THEN 1 ELSE 0 END) AS BIGINT) AS n_tail,
             round(CAST(sum(CASE WHEN CAST(e."value" AS DOUBLE) >= c.var_q
                 THEN CAST(e."value" AS DECIMAL(30,8)) END) AS DOUBLE)
               / CAST(sum(CASE WHEN CAST(e."value" AS DOUBLE) >= c.var_q
                 THEN 1 ELSE 0 END) AS DOUBLE), 9) AS cvar
      FROM events e JOIN c USING (event_type)
      WHERE e."value" IS NOT NULL
      GROUP BY 1 ORDER BY 1
    """.trim))

  /** Position-based multi-touch attribution
    * ([[EventAnalytics.positionAttribution]], 40/20/40): every touch
    * before a user's FIRST purchase shares the credit — the
    * U-shaped answer to q170's last-touch bottom-of-funnel bias.
    * The middle weight literal is exactly Scala's `1.0 - 2*0.4`.
    */
  val q357PositionAttribution = HarnessQuery(
    "q357_position_attribution",
    (spark, dir) =>
      EventAnalytics.positionAttribution(
        Tables.events(spark, dir), "user_id", "ts", "event_id",
        "event_type", conversionEvent = "purchase", wEnds = 0.4)
        .orderBy(col("channel")),
    Some("""
      WITH c AS (SELECT user_id, ts AS cts, event_id AS ctie,
                        row_number() OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS rk
                 FROM events WHERE event_type = 'purchase'),
      fc AS (SELECT user_id, cts, ctie FROM c WHERE rk = 1),
      touches AS (SELECT e.user_id, e.event_type,
                         row_number() OVER (PARTITION BY e.user_id
                           ORDER BY e.ts, e.event_id) AS i,
                         count(*) OVER (PARTITION BY e.user_id) AS k
                  FROM events e JOIN fc f USING (user_id)
                  WHERE e.event_type <> 'purchase'
                    AND (e.ts, e.event_id) < (f.cts, f.ctie))
      SELECT event_type AS channel, count(*) AS n_touches,
             round(CAST(sum(CAST(
               CASE WHEN k = 1 THEN CAST(1.0 AS DOUBLE)
                    WHEN k = 2 THEN CAST(0.5 AS DOUBLE)
                    WHEN i = 1 OR i = k THEN CAST(0.4 AS DOUBLE)
                    ELSE CAST(0.19999999999999996 AS DOUBLE) / (k - 2)
               END AS DECIMAL(25,12))) AS DOUBLE), 9) AS credit
      FROM touches GROUP BY 1 ORDER BY 1
    """.trim))

  /** Exact Shapley channel attribution
    * ([[EventAnalytics.shapleyAttribution]], 4 channels = 16 subsets):
    * v(S) is the conversion rate of users whose touched-channel set is
    * exactly S (q208's conversion definition), credits are the exact
    * Shapley sums with factorial weights, decimal-accumulated. The
    * oracle replays the bitmask game over generate_series masks.
    */
  val q368Shapley = HarnessQuery(
    "q368_shapley",
    (spark, dir) =>
      EventAnalytics.shapleyAttribution(
        Tables.events(spark, dir)
          .withColumn("conv", when(col("event_type") === "purchase"
            && col("value") > 300.0d, 1).otherwise(0)),
        "user_id", "event_type", "conv",
        channels = Seq("click", "view", "signup", "error"))
        .orderBy(col("channel")),
    Some("""
      WITH ch AS (SELECT * FROM (VALUES ('click', 0), ('view', 1),
                    ('signup', 2), ('error', 3)) AS t(channel, ix)),
      uc AS (SELECT DISTINCT e.user_id, ch.ix
             FROM events e JOIN ch ON e.event_type = ch.channel),
      um AS (SELECT user_id, CAST(sum(1 << ix) AS BIGINT) AS mask
             FROM uc GROUP BY 1),
      cv AS (SELECT user_id,
                    max(CASE WHEN event_type = 'purchase' AND "value" > 300
                      THEN 1 ELSE 0 END) AS conv
             FROM events GROUP BY 1),
      u AS (SELECT cv.user_id, coalesce(um.mask, 0) AS mask, cv.conv
            FROM cv LEFT JOIN um USING (user_id)),
      vm AS (SELECT mask, count(*) AS n, CAST(sum(conv) AS BIGINT) AS nc
             FROM u GROUP BY 1),
      v AS (SELECT g.mask,
                   coalesce(vm.n, 0) AS n,
                   coalesce(CAST(vm.nc AS DOUBLE) / vm.n, 0.0) AS v
            FROM (SELECT unnest(generate_series(0, 15)) AS mask) g
            LEFT JOIN vm USING (mask)),
      terms AS (
        SELECT ch.channel,
               (CAST(CASE (((v0.mask >> 0) & 1) + ((v0.mask >> 1) & 1)
                         + ((v0.mask >> 2) & 1) + ((v0.mask >> 3) & 1))
                     WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 WHEN 3 THEN 6
                     END AS DOUBLE) / CAST(24 AS DOUBLE))
               * (v1.v - v0.v) AS t
        FROM v v0
        JOIN ch ON (v0.mask >> ch.ix) & 1 = 0
        JOIN v v1 ON v1.mask = v0.mask | (1 << ch.ix)),
      sh AS (SELECT channel,
                    round(CAST(sum(CAST(t AS DECIMAL(30,15))) AS DOUBLE), 12)
                      AS shapley
             FROM terms GROUP BY 1),
      tu AS (SELECT ch.channel, CAST(sum(vm.n) AS BIGINT) AS n_units
             FROM vm JOIN ch ON (vm.mask >> ch.ix) & 1 = 1
             GROUP BY 1)
      SELECT sh.channel, coalesce(tu.n_units, 0) AS n_units, sh.shapley
      FROM sh LEFT JOIN tu USING (channel)
      ORDER BY channel
    """.trim))

  /** Benford first-digit audit ([[graft.operators.Forensics
    * .benfordDigitAudit]]) of event amounts per event type — the
    * unsupervised fraud screen: observed leading-digit counts vs
    * Benford's log10(1+1/d) with the per-group chi-square. Digits are
    * read from the integer-cents string (scale-invariant, no
    * double-log digit extraction to wobble cross-engine); the
    * chi-square accumulates its nine terms in DECIMAL.
    */
  val q379Benford = HarnessQuery(
    "q379_benford",
    (spark, dir) =>
      graft.operators.Forensics.benfordDigitAudit(
        Tables.events(spark, dir), "event_type", "value")
        .orderBy(col("event_type"), col("digit")),
    Some("""
      WITH base AS (
        SELECT event_type,
               CAST(substr(CAST(CAST(round(value * 100) AS BIGINT)
                 AS VARCHAR), 1, 1) AS INT) AS digit
        FROM events
        WHERE value IS NOT NULL
          AND CAST(round(value * 100) AS BIGINT) >= 1),
      obs AS (SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n_obs
              FROM base GROUP BY 1, 2),
      tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
              FROM base GROUP BY 1),
      frame0 AS (
        SELECT t.event_type, t.n, CAST(d.d AS INT) AS digit
        FROM tot t, generate_series(1, 9) d(d)),
      frame AS (
        SELECT f.event_type, f.digit, f.n,
               coalesce(o.n_obs, 0) AS n_obs,
               ln((CAST(f.digit AS DOUBLE) + 1.0) / f.digit) / ln(10.0) AS p
        FROM frame0 f
        LEFT JOIN obs o ON o.event_type = f.event_type
                       AND o.digit = f.digit),
      terms AS (
        SELECT event_type, digit, n_obs,
               floor(p * 1e12) / 1e12 AS benford_p,
               CAST((CAST(n_obs AS DOUBLE) - n * p)
                    * (CAST(n_obs AS DOUBLE) - n * p) / (n * p)
                 AS DECIMAL(30,15)) AS term
        FROM frame)
      SELECT event_type, digit, n_obs, benford_p,
             floor(CAST(sum(term) OVER (PARTITION BY event_type)
               AS DOUBLE) * 1e6) / 1e6 AS chi2
      FROM terms ORDER BY event_type, digit
    """.trim))

  /** Round-amount bias ([[graft.operators.Forensics.roundAmountBias]])
    * per event type: shares of exact whole-unit and ten-unit amounts —
    * all-integer counts, one final floored division.
    */
  val q380RoundAmounts = HarnessQuery(
    "q380_round_amounts",
    (spark, dir) =>
      graft.operators.Forensics.roundAmountBias(
        Tables.events(spark, dir), "event_type", "value")
        .orderBy(col("event_type")),
    Some("""
      WITH base AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL AND value > 0)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_amounts,
             CAST(sum(CASE WHEN c % 100 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_whole,
             CAST(sum(CASE WHEN c % 1000 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tens,
             floor(CAST(sum(CASE WHEN c % 100 = 0 THEN 1 ELSE 0 END)
               AS DOUBLE) / count(*) * 1e9) / 1e9 AS whole_share,
             floor(CAST(sum(CASE WHEN c % 1000 = 0 THEN 1 ELSE 0 END)
               AS DOUBLE) / count(*) * 1e9) / 1e9 AS tens_share
      FROM base GROUP BY 1 ORDER BY 1
    """.trim))

  def all: Seq[HarnessQuery] = Seq(
    q168CohortRetention, q169Funnel, q170Attribution, q171PercentileBands,
    q172Twap, q177Entropy, q243Gini, q251Ols, q257WeightedMedian,
    q262Hill, q263Cvar, q357PositionAttribution, q368Shapley,
    q379Benford, q380RoundAmounts)
}

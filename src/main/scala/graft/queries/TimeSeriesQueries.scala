package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{EventAnalytics, TextDedup, TimeSeries}
import graft.sources.Tables

/** Time-series resampling/monitoring queries (OHLC bars, rolling
  * volatility, CUSUM changepoints, seasonal anomalies) plus the
  * sequence-analytics additions (streaks, Markov transitions, type
  * co-occurrence) and sorted-neighborhood dedup.
  */
object TimeSeriesQueries {

  /** Daily OHLC bars per user ([[TimeSeries.ohlcDaily]]): open/close
    * under the deterministic (ts, event_id) order, exact decimal
    * volume.
    */
  val q178Ohlc = HarnessQuery(
    "q178_ohlc",
    (spark, dir) =>
      TimeSeries.ohlcDaily(
        Tables.events(spark, dir), "user_id", "ts", "event_id", "value")
        .orderBy(col("user_id"), col("day")),
    Some("""
      WITH e AS (
        SELECT user_id, event_id, "value",
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        FROM events),
      f AS (
        SELECT user_id, day, "value",
               first_value("value") OVER
                 (PARTITION BY user_id, day ORDER BY us, event_id) AS o,
               last_value("value") OVER
                 (PARTITION BY user_id, day ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING
                    AND UNBOUNDED FOLLOWING) AS c
        FROM e)
      SELECT user_id, day,
             min(o) AS open, max("value") AS high, min("value") AS low,
             min(c) AS close, count(*) AS n_events,
             CAST(sum(CAST("value" AS DECIMAL(28,6))) AS DOUBLE) AS volume
      FROM f GROUP BY 1, 2 ORDER BY 1, 2
    """.trim))

  /** 24 h rolling population std of event value per user
    * ([[TimeSeries.rollingStd]]): exact in-window decimal sums, the
    * identical one-double-expression variance on both engines.
    */
  val q179RollingStd = HarnessQuery(
    "q179_rolling_std",
    (spark, dir) =>
      TimeSeries.rollingStd(
        Tables.events(spark, dir), "user_id", "ts", "value", 86400L)
        .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
        .orderBy(col("user_id"), col("ts_us"), col("value")),
    Some("""
      WITH e AS (
        SELECT user_id, "value",
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               CAST("value" AS DECIMAL(18,6)) AS v
        FROM events WHERE "value" IS NOT NULL),
      w AS (
        SELECT user_id, us AS ts_us, "value",
               sum(v) OVER win AS s,
               sum(v * v) OVER win AS ss,
               count(*) OVER win AS n
        FROM e
        WINDOW win AS (PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN 86399999999 PRECEDING
                         AND CURRENT ROW))
      SELECT user_id, ts_us, "value", n AS n_window,
             (CAST(ss AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               / CAST(n AS DOUBLE) AS var_window,
             sqrt(greatest((CAST(ss AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               / CAST(n AS DOUBLE), 0)) AS std_window
      FROM w ORDER BY 1, 2, 3
    """.trim))

  /** CUSUM changepoint per event type ([[TimeSeries.cusumChangepoint]])
    * — the integer N·S_t − t·S_N formulation, argmax ties to the
    * earliest day.
    */
  val q180Cusum = HarnessQuery(
    "q180_cusum",
    (spark, dir) =>
      TimeSeries.cusumChangepoint(
        Tables.events(spark, dir), "event_type", "ts")
        .orderBy(col("event_type")),
    Some("""
      WITH daily AS (
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
               count(*) AS n
        FROM events GROUP BY 1, 2),
      tot AS (
        SELECT event_type, sum(n) AS sn, count(*) AS nd
        FROM daily GROUP BY 1),
      cus AS (
        SELECT d.event_type, d.day, t.nd,
               abs(CAST(t.nd AS HUGEINT)
                     * sum(d.n) OVER (PARTITION BY d.event_type
                                      ORDER BY d.day)
                   - CAST(row_number() OVER (PARTITION BY d.event_type
                                             ORDER BY d.day) AS HUGEINT)
                     * CAST(t.sn AS HUGEINT)) AS mag
        FROM daily d JOIN tot t USING (event_type))
      SELECT event_type, day AS change_day,
             CAST(mag AS DOUBLE) / CAST(nd AS DOUBLE) AS cusum_peak,
             nd AS n_days
      FROM cus
      QUALIFY row_number() OVER (PARTITION BY event_type
                                 ORDER BY mag DESC, day) = 1
      ORDER BY 1
    """.trim))

  /** Day-of-week seasonal anomaly scores per event type
    * ([[TimeSeries.seasonalAnomaly]]): integer epoch-day dow, exact
    * count sums, identical z expression.
    */
  val q181SeasonalAnomaly = HarnessQuery(
    "q181_seasonal_anomaly",
    (spark, dir) =>
      TimeSeries.seasonalAnomaly(
        Tables.events(spark, dir), "event_type", "ts")
        .orderBy(col("event_type"), col("day")),
    Some("""
      WITH daily AS (
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
               count(*) AS n
        FROM events GROUP BY 1, 2),
      d2 AS (SELECT *, day % 7 AS dow FROM daily),
      base AS (
        SELECT event_type, dow,
               CAST(sum(CAST(n AS HUGEINT)) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS dow_mean,
               sqrt(greatest(
                 (CAST(sum(CAST(n AS HUGEINT) * CAST(n AS HUGEINT))
                    AS DOUBLE)
                  - CAST(sum(CAST(n AS HUGEINT)) AS DOUBLE)
                    * CAST(sum(CAST(n AS HUGEINT)) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE))
                 / CAST(count(*) AS DOUBLE), 0)) AS dow_std
        FROM d2 GROUP BY 1, 2)
      SELECT d2.event_type, d2.day, d2.dow, d2.n, b.dow_mean, b.dow_std,
             CASE WHEN b.dow_std > 0
               THEN (CAST(d2.n AS DOUBLE) - b.dow_mean) / b.dow_std
               ELSE 0 END AS z
      FROM d2 JOIN base b USING (event_type, dow)
      ORDER BY 1, 2
    """.trim))

  /** Longest consecutive-active-day streak per user
    * ([[EventAnalytics.activityStreaks]]) — gaps-and-islands on
    * integer epoch days, earliest-longest tie-break.
    */
  val q182Streaks = HarnessQuery(
    "q182_streaks",
    (spark, dir) =>
      EventAnalytics.activityStreaks(
        Tables.events(spark, dir), "user_id", "ts")
        .orderBy(col("user_id")),
    Some("""
      WITH days AS (
        SELECT DISTINCT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        FROM events),
      isl AS (
        SELECT user_id,
               day - row_number() OVER (PARTITION BY user_id
                                        ORDER BY day) AS island, day
        FROM days),
      runs AS (
        SELECT user_id, island, count(*) AS len, min(day) AS start
        FROM isl GROUP BY 1, 2),
      best AS (
        SELECT user_id, len, start FROM runs
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY len DESC, start) = 1),
      tot AS (
        SELECT user_id, max(len) AS longest_streak,
               CAST(sum(len) AS BIGINT) AS active_days
        FROM runs GROUP BY 1)
      SELECT t.user_id, t.longest_streak,
             b.start AS streak_start_day, t.active_days
      FROM tot t JOIN best b USING (user_id) ORDER BY 1
    """.trim))

  /** Event-type Markov transition matrix
    * ([[EventAnalytics.markovTransitions]]) over per-user sequences
    * under the (ts, event_id) order.
    */
  val q183Markov = HarnessQuery(
    "q183_markov",
    (spark, dir) =>
      EventAnalytics.markovTransitions(
        Tables.events(spark, dir), "user_id", "ts", "event_id",
        "event_type")
        .orderBy(col("from_type"), col("to_type")),
    Some("""
      WITH seq AS (
        SELECT user_id, event_type AS from_type,
               lead(event_type, 1) OVER
                 (PARTITION BY user_id
                  ORDER BY ts, event_id) AS to_type
        FROM events),
      pairs AS (
        SELECT from_type, to_type, count(*) AS n_pairs
        FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n_pairs,
             CAST(n_pairs AS DOUBLE)
               / CAST(sum(n_pairs) OVER (PARTITION BY from_type)
                      AS DOUBLE) AS p
      FROM pairs ORDER BY 1, 2
    """.trim))

  /** Event-type co-occurrence cosine
    * ([[EventAnalytics.typeCooccurrence]]): bipartite projection of
    * the user↔type graph, exact counts.
    */
  val q184Cooccurrence = HarnessQuery(
    "q184_cooccurrence",
    (spark, dir) =>
      EventAnalytics.typeCooccurrence(
        Tables.events(spark, dir), "user_id", "event_type")
        .orderBy(col("type_a"), col("type_b")),
    Some("""
      WITH et AS (SELECT DISTINCT user_id, event_type FROM events),
      marg AS (SELECT event_type AS t, count(*) AS n_t FROM et GROUP BY 1),
      pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_both
        FROM et a JOIN et b ON a.user_id = b.user_id
          AND a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT type_a, type_b, n_both,
             CAST(n_both AS DOUBLE)
               / sqrt(CAST(ma.n_t AS DOUBLE) * CAST(mb.n_t AS DOUBLE))
               AS cosine
      FROM pairs
      JOIN marg ma ON type_a = ma.t
      JOIN marg mb ON type_b = mb.t
      ORDER BY 1, 2
    """.trim))

  /** Blocked sorted-neighborhood near-dup pairs
    * ([[TextDedup.sortedNeighborhoodPairs]]): normalized-prefix
    * blocking key, window of 3 sorted neighbors, Levenshtein over the
    * leading 64 chars.
    */
  val q185SnmPairs = HarnessQuery(
    "q185_snm_pairs",
    (spark, dir) =>
      TextDedup.sortedNeighborhoodPairs(
        Tables.documents(spark, dir), "text", "doc_id",
        keyLen = 16, windowSize = 3, probeLen = 64,
        maxDistance = 30, blockLen = 4)
        .orderBy(col("id_a"), col("id_b")),
    Some("""
      WITH base AS (
        SELECT doc_id,
               substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                      1, 16) AS key,
               substr(text, 1, 64) AS probe
        FROM documents),
      b2 AS (SELECT *, substr(key, 1, 4) AS block FROM base),
      led AS (
        SELECT doc_id, probe,
               lead(doc_id, 1) OVER win AS id1,
               lead(probe, 1) OVER win AS pr1,
               lead(doc_id, 2) OVER win AS id2,
               lead(probe, 2) OVER win AS pr2,
               lead(doc_id, 3) OVER win AS id3,
               lead(probe, 3) OVER win AS pr3
        FROM b2
        WINDOW win AS (PARTITION BY block ORDER BY key, doc_id)),
      pairs AS (
        SELECT doc_id AS id_a, id1 AS id_b,
               levenshtein(probe, pr1) AS edit_distance
        FROM led WHERE id1 IS NOT NULL
        UNION ALL
        SELECT doc_id, id2, levenshtein(probe, pr2)
        FROM led WHERE id2 IS NOT NULL
        UNION ALL
        SELECT doc_id, id3, levenshtein(probe, pr3)
        FROM led WHERE id3 IS NOT NULL)
      SELECT id_a, id_b, edit_distance
      FROM pairs WHERE edit_distance <= 30
      ORDER BY 1, 2
    """.trim))

  /** Truncated half-life EWMA over the dense per-group daily activity
    * series ([[TimeSeries.ewmaTruncated]] on [[graft.operators.Resample]]
    * output, K = 8): power-of-two weights make every term exact in
    * double, so the smoothed series matches the oracle's identical
    * left-associated lag chain bit-for-bit — no rounding anywhere.
    */
  val q250Ewma = HarnessQuery(
    "q250_ewma",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .withColumn("grp", pmod(col("user_id"), lit(20L)))
      val daily = graft.operators.Resample
        .resample(ev, "ts", "grp", 86400000000L, "value")
      TimeSeries.ewmaTruncated(daily, "grp", "bucket_start", "n_events")
        .select(col("grp"), unix_micros(col("bucket_start")).as("bucket_us"),
          col("n_events"), col("ewma"))
        .orderBy(col("grp"), col("bucket_us"))
    },
    Some("""
      WITH e AS (SELECT user_id % 20 AS grp,
                        epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS b
                 FROM events),
      a AS (SELECT grp, b, count(*) AS n FROM e GROUP BY 1, 2),
      span AS (SELECT grp, min(b) AS mn, max(b) AS mx FROM a GROUP BY 1),
      grid AS (SELECT grp, unnest(generate_series(mn, mx)) AS b FROM span),
      r AS (SELECT g.grp, g.b, coalesce(a.n, 0) AS n
            FROM grid g LEFT JOIN a USING (grp, b))
      SELECT grp, b * 86400000000 AS bucket_us,
             CAST(n AS BIGINT) AS n_events,
             CAST(n AS DOUBLE) * 0.5
               + coalesce(CAST(lag(n, 1) OVER w AS DOUBLE), 0.0) * 0.25
               + coalesce(CAST(lag(n, 2) OVER w AS DOUBLE), 0.0) * 0.125
               + coalesce(CAST(lag(n, 3) OVER w AS DOUBLE), 0.0) * 0.0625
               + coalesce(CAST(lag(n, 4) OVER w AS DOUBLE), 0.0) * 0.03125
               + coalesce(CAST(lag(n, 5) OVER w AS DOUBLE), 0.0) * 0.015625
               + coalesce(CAST(lag(n, 6) OVER w AS DOUBLE), 0.0) * 0.0078125
               + coalesce(CAST(lag(n, 7) OVER w AS DOUBLE), 0.0) * 0.00390625
               AS ewma
      FROM r WINDOW w AS (PARTITION BY grp ORDER BY b)
      ORDER BY 1, 2
    """.trim))

  /** Daily click↔purchase value co-movement
    * ([[TimeSeries.seriesCorrelation]]): exact decimal moments over
    * the day series, one rounded Pearson expression.
    */
  val q258SeriesCorr = HarnessQuery(
    "q258_series_corr",
    (spark, dir) =>
      TimeSeries.seriesCorrelation(
        Tables.events(spark, dir), "event_type", "ts", "value",
        "click", "purchase")
        .select(col("n_days"),
          round(col("sum_a"), 6).as("sum_a"),
          round(col("sum_b"), 6).as("sum_b"),
          col("r")),
    Some("""
      WITH d AS (
        SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
               CAST(coalesce(sum(CASE WHEN event_type = 'click'
                 THEN CAST("value" AS DECIMAL(18,6)) END), 0)
                 AS DECIMAL(19,6)) AS x,
               CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                 THEN CAST("value" AS DECIMAL(18,6)) END), 0)
                 AS DECIMAL(19,6)) AS y
        FROM events
        WHERE event_type IN ('click', 'purchase') AND "value" IS NOT NULL
        GROUP BY 1),
      m AS (
        SELECT CAST(count(*) AS DECIMAL(10,0)) AS n,
               CAST(sum(x) AS DECIMAL(19,6)) AS sx,
               CAST(sum(y) AS DECIMAL(19,6)) AS sy,
               CAST(sum(x * y) AS DECIMAL(28,12)) AS sxy,
               CAST(sum(x * x) AS DECIMAL(28,12)) AS sxx,
               CAST(sum(y * y) AS DECIMAL(28,12)) AS syy
        FROM d)
      SELECT CAST(n AS BIGINT) AS n_days,
             round(CAST(sx AS DOUBLE), 6) AS sum_a,
             round(CAST(sy AS DOUBLE), 6) AS sum_b,
             round(CAST(n * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                 * CAST(n * syy - sy * sy AS DOUBLE)), 9) AS r
      FROM m
    """.trim))

  /** Max drawdown of each event type's cumulative daily value
    * ([[TimeSeries.maxDrawdown]]): decimal-exact running sums and
    * running peaks; only the reported columns cast to double.
    */
  val q260Drawdown = HarnessQuery(
    "q260_drawdown",
    (spark, dir) =>
      TimeSeries.maxDrawdown(
        Tables.events(spark, dir), "event_type", "ts", "value")
        .select(col("event_type"), col("n_days"),
          round(col("final_value"), 6).as("final_value"),
          round(col("peak_value"), 6).as("peak_value"),
          round(col("max_drawdown"), 6).as("max_drawdown")),
    Some("""
      WITH daily AS (
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
               CAST(sum(CAST("value" AS DECIMAL(18,6))) AS DECIMAL(28,6))
                 AS s
        FROM events WHERE "value" IS NOT NULL GROUP BY 1, 2),
      c1 AS (
        SELECT event_type, d,
               CAST(sum(s) OVER (PARTITION BY event_type ORDER BY d)
                 AS DECIMAL(28,6)) AS cum
        FROM daily),
      c2 AS (
        SELECT event_type, d, cum,
               CAST(max(cum) OVER (PARTITION BY event_type ORDER BY d)
                 AS DECIMAL(28,6)) AS peak
        FROM c1)
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             round(CAST(max_by(cum, d) AS DOUBLE), 6) AS final_value,
             round(CAST(max(peak) AS DOUBLE), 6) AS peak_value,
             round(CAST(max(peak - cum) AS DOUBLE), 6) AS max_drawdown
      FROM c2 GROUP BY 1 ORDER BY 1
    """.trim))

  def all: Seq[HarnessQuery] = Seq(
    q178Ohlc, q179RollingStd, q180Cusum, q181SeasonalAnomaly,
    q182Streaks, q183Markov, q184Cooccurrence, q185SnmPairs, q250Ewma,
    q258SeriesCorr, q260Drawdown)
}

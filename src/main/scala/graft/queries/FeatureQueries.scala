package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Sessions, TimeFeatures, Velocity}
import graft.sources.Tables

/** M2: temporal feature engineering + 24 h velocity windows
  * (SURVEY.md §2.3 F3-F6, §2.6 W1) over `events`.
  */
object FeatureQueries {

  /** W1: trailing-24 h event counts per key (user and event_type), RANGE
    * frame over event-time microseconds; -1 excludes the row itself.
    */
  val q20Velocity = HarnessQuery(
    "q20_velocity_24h",
    (spark, dir) =>
      Velocity.rollingCounts(
        Tables.events(spark, dir), "ts", Seq("user_id", "event_type"))
        .select(col("event_id"), col("user_id_tx_24h"), col("event_type_tx_24h"))
        .orderBy(col("event_id")),
    Some("""
      SELECT event_id,
             count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
               RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) - 1 AS user_id_tx_24h,
             count(*) OVER (PARTITION BY event_type ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
               RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) - 1 AS event_type_tx_24h
      FROM events ORDER BY event_id
    """.trim))

  /** W1 at scale: hot-key-safe pre-aggregated variant — collapse to
    * per-(key, second) counts before the range window, join back. Bounds
    * window partition size by distinct seconds, not raw events.
    */
  val q21VelocityPreAgg = HarnessQuery(
    "q21_velocity_preagg",
    (spark, dir) =>
      Velocity.rollingCountsPreAgg(
        Tables.events(spark, dir), "ts", "user_id", outCol = "user_tx_24h")
        .select(col("event_id"), col("user_tx_24h"))
        .orderBy(col("event_id")),
    Some("""
      SELECT event_id,
             count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
               RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW) - 1 AS user_tx_24h
      FROM events ORDER BY event_id
    """.trim))

  /** F3-F6: hour-of-day, Monday=0 day-of-week, elapsed time since each
    * user's first event in seconds and hours.
    */
  val q22TimeFeatures = HarnessQuery(
    "q22_time_features",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
      val byUser = Window.partitionBy(col("user_id"))
      val ordered = byUser.orderBy(col("ts"), col("event_id"))
      val firstTs = min(col("ts")).over(byUser)
      val prevTs = lag(col("ts"), 1).over(ordered)
      ev.select(
          col("event_id"),
          TimeFeatures.hourOfDay(col("ts")).as("hour_of_day"),
          TimeFeatures.dayOfWeekMon0(col("ts")).as("day_of_week"),
          TimeFeatures.secondsBetween(firstTs, col("ts")).as("secs_since_first"),
          TimeFeatures.hoursBetween(firstTs, col("ts")).as("hours_since_first"),
          TimeFeatures.secondsBetween(prevTs, col("ts")).as("secs_since_prev"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id,
             hour(ts) AS hour_of_day,
             isodow(ts) - 1 AS day_of_week,
             (epoch_us(CAST(ts AS TIMESTAMP)) -
              min(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id)) / 1000000.0
               AS secs_since_first,
             ((epoch_us(CAST(ts AS TIMESTAMP)) -
               min(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id)) / 1000000.0) / 3600.0
               AS hours_since_first,
             (epoch_us(CAST(ts AS TIMESTAMP)) -
              lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)) / 1000000.0
               AS secs_since_prev
      FROM events ORDER BY event_id
    """.trim))

  /** Batch sessionization via native session_window (4 h inactivity
    * gap) — the same grouping runs unchanged under Structured Streaming.
    * Oracle: classic gaps-and-islands SQL. Session end = last ts + gap;
    * a new session starts only when the inter-event gap EXCEEDS 4 h
    * (touching windows merge: an event exactly gap after the previous
    * one extends the session — probed against session_window directly).
    */
  val q23Sessions = HarnessQuery(
    "q23_sessions",
    (spark, dir) =>
      Sessions.sessionize(
        Tables.events(spark, dir), "ts", "user_id", "4 hours", "value")
        .orderBy(col("user_id"), col("session_start_us")),
    Some("""
      WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
                 FROM events),
      m AS (SELECT user_id, us, value,
                   CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                          <= 14400000000 THEN 0 ELSE 1 END AS brk
            FROM e),
      s AS (SELECT user_id, us, value,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY us
                     ROWS UNBOUNDED PRECEDING) AS sid
            FROM m)
      SELECT user_id, min(us) AS session_start_us,
             max(us) + 14400000000 AS session_end_us,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      FROM s GROUP BY user_id, sid
      ORDER BY user_id, session_start_us
    """.trim))

  /** Semi-structured extraction: schema'd from_json over the `props`
    * JSON column (Catalyst JsonToStructs — codegen'd, pushes no work to
    * a UDF), aggregated per event type. Nulls and parse failures yield
    * null k, excluded by count/sum like SQL.
    */
  val q24JsonExtract = HarnessQuery(
    "q24_json_extract",
    (spark, dir) =>
      Tables.events(spark, dir)
        .withColumn("k",
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
            .getField("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_with_k"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
    Some("""
      SELECT event_type,
             count(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
             CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
             max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
      FROM events GROUP BY 1 ORDER BY 1
    """.trim))

  /** Quantile binning (feature discretization): decile of `value`
    * within each event type. Deterministic tie-break on event_id; null
    * ordering pinned on both sides (Spark defaults NULLS FIRST for ASC,
    * DuckDB NULLS LAST).
    */
  val q25Ntile = HarnessQuery(
    "q25_ntile",
    (spark, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").asc_nulls_first, col("event_id"))
      Tables.events(spark, dir)
        .select(col("event_id"), col("event_type"),
          ntile(10).over(w).cast("long").as("decile"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, event_type,
             ntile(10) OVER (PARTITION BY event_type
               ORDER BY value ASC NULLS FIRST, event_id) AS decile
      FROM events ORDER BY event_id
    """.trim))

  /** Pivot (crosstab): events per (weekday, event_type) as a wide
    * table — explicit value list so the output schema is static; empty
    * cells filled with 0 to match SQL conditional counts.
    */
  val q26Pivot = HarnessQuery(
    "q26_pivot",
    (spark, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(spark, dir)
        .withColumn("dow", TimeFeatures.dayOfWeekMon0(col("ts")))
        .groupBy(col("dow"))
        .pivot("event_type", types)
        .count()
        .na.fill(0L, types)
        .orderBy(col("dow"))
    },
    Some("""
      SELECT isodow(ts) - 1 AS dow,
             count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
             count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
             count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
             count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
             count(CASE WHEN event_type = 'view' THEN 1 END) AS view
      FROM events GROUP BY 1 ORDER BY dow
    """.trim))

  /** Daily resampling with gap fill
    * ([[graft.operators.Resample.resample]]): per user-group daily
    * event counts/sums with EMPTY days present as zero rows — the
    * oracle replays the dense grid via generate_series.
    */
  val q102Resample = HarnessQuery(
    "q102_resample",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .withColumn("grp", pmod(col("user_id"), lit(20L)))
      graft.operators.Resample
        .resample(ev, "ts", "grp", 86400000000L, "value")
        // harness convention: timestamps cross the oracle as micros longs
        .select(col("grp"), unix_micros(col("bucket_start")).as("bucket_us"),
          col("n_events"), col("sum_value"))
        .orderBy(col("grp"), col("bucket_us"))
    },
    Some("""
      WITH e AS (SELECT user_id % 20 AS grp,
                        epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS b,
                        value
                 FROM events),
      a AS (SELECT grp, b, count(*) AS n,
                   sum(CAST(value AS DECIMAL(25,6))) AS s
            FROM e GROUP BY 1, 2),
      span AS (SELECT grp, min(b) AS mn, max(b) AS mx FROM a GROUP BY 1),
      grid AS (SELECT grp, unnest(generate_series(mn, mx)) AS b FROM span)
      SELECT g.grp, g.b * 86400000000 AS bucket_us,
             coalesce(a.n, 0) AS n_events,
             coalesce(CAST(a.s AS DOUBLE), 0.0) AS sum_value
      FROM grid g LEFT JOIN a USING (grp, b)
      ORDER BY 1, 2
    """.trim))

  /** Inter-arrival regularity ([[Velocity.interArrivalRegularity]]):
    * per-user coefficient of variation of event gaps — the
    * metronome-bot detector (CV ≈ 0 at any volume is a timer, which
    * raw velocity counts never see). Exact decimal moments; flags need
    * >= 5 gaps and cv < 0.5.
    */
  val q361GapRegularity = HarnessQuery(
    "q361_gap_regularity",
    (spark, dir) =>
      Velocity.interArrivalRegularity(
        Tables.events(spark, dir), "user_id", "ts", "event_id",
        minGaps = 5, cvFlag = 0.5)
        .orderBy(col("user_id")),
    Some("""
      WITH g AS (
        SELECT user_id,
               CAST(epoch_us(CAST(ts AS TIMESTAMP))
                    - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
                      (PARTITION BY user_id ORDER BY ts, event_id)
                 AS DOUBLE) / 1000000.0 AS gp
        FROM events),
      gg AS (SELECT user_id, gp FROM g WHERE gp IS NOT NULL),
      a AS (SELECT user_id, count(*) AS n_gaps,
                   CAST(sum(CAST(gp AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS mean_,
                   CAST(sum(CAST(gp * gp AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS m2
            FROM gg GROUP BY 1)
      SELECT user_id, n_gaps,
             round(mean_, 3) AS mean_gap_s,
             round(sqrt(greatest(m2 - mean_ * mean_, 0.0)), 3) AS std_gap_s,
             CASE WHEN mean_ > 0
                  THEN round(sqrt(greatest(m2 - mean_ * mean_, 0.0)) / mean_, 6)
             END AS cv,
             n_gaps >= 5 AND coalesce(
               CASE WHEN mean_ > 0
                    THEN round(sqrt(greatest(m2 - mean_ * mean_, 0.0)) / mean_, 6)
               END < 0.5, false) AS regular
      FROM a ORDER BY user_id
    """.trim))

  def all: Seq[HarnessQuery] =
    Seq(q20Velocity, q21VelocityPreAgg, q22TimeFeatures, q23Sessions,
      q24JsonExtract, q25Ntile, q26Pivot, q102Resample, q361GapRegularity)
}

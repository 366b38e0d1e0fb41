package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Eda
import graft.sources.Tables

/** M3: EDA aggregates (SURVEY.md §2.5 A1-A8) as oracle-checked queries. */
object EdaQueries {

  /** A1: describe() over three lineitem numerics — exact quartiles.
    * mean/std/quartiles rounded to 6 decimals on both sides: the
    * double->decimal cast of squared values can land on rounding ties
    * where Spark and DuckDB disagree in the last ulp (seen at sf0.1).
    */
  val q30Describe = HarnessQuery(
    "q30_describe",
    (spark, dir) => {
      val d = Eda.describe(
        Tables.lineitem(spark, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
      Seq("mean", "std", "p25", "p50", "p75")
        .foldLeft(d)((df, c) => df.withColumn(c, round(col(c), 6)))
        .orderBy(col("column_name"))
    },
    Some("""
      WITH stats AS (
        SELECT 'l_quantity' AS column_name, count(l_quantity) AS n_count,
               CAST(sum(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS s,
               CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS ss,
               CAST(min(l_quantity) AS DOUBLE) AS min_val,
               quantile_cont(l_quantity, 0.25) AS p25,
               quantile_cont(l_quantity, 0.5) AS p50,
               quantile_cont(l_quantity, 0.75) AS p75,
               CAST(max(l_quantity) AS DOUBLE) AS max_val
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', count(l_extendedprice),
               CAST(sum(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE),
               CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,8))) AS DOUBLE),
               CAST(min(l_extendedprice) AS DOUBLE),
               quantile_cont(l_extendedprice, 0.25), quantile_cont(l_extendedprice, 0.5),
               quantile_cont(l_extendedprice, 0.75), CAST(max(l_extendedprice) AS DOUBLE)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', count(l_discount),
               CAST(sum(CAST(l_discount AS DECIMAL(30,8))) AS DOUBLE),
               CAST(sum(CAST(l_discount * l_discount AS DECIMAL(30,8))) AS DOUBLE),
               CAST(min(l_discount) AS DOUBLE),
               quantile_cont(l_discount, 0.25), quantile_cont(l_discount, 0.5),
               quantile_cont(l_discount, 0.75), CAST(max(l_discount) AS DOUBLE)
        FROM lineitem)
      SELECT column_name, n_count, round(s / n_count, 6) AS mean,
             round(sqrt((ss - s * s / n_count) / (n_count - 1)), 6) AS std,
             min_val, round(p25, 6) AS p25, round(p50, 6) AS p50,
             round(p75, 6) AS p75, max_val
      FROM stats ORDER BY column_name
    """.trim))

  /** A2/A7: value_counts, most-frequent-first with value tie-break. */
  val q31ValueCounts = HarnessQuery(
    "q31_value_counts",
    (spark, dir) =>
      Eda.valueCounts(Tables.orders(spark, dir), "o_orderpriority"),
    Some("""
      SELECT o_orderpriority, count(*) AS count
      FROM orders GROUP BY o_orderpriority
      ORDER BY count DESC, o_orderpriority
    """.trim))

  /** A5: grouped mean sorted desc (fraud-rate-by-category shape). */
  val q32GroupedMean = HarnessQuery(
    "q32_grouped_mean",
    (spark, dir) =>
      Eda.groupedMean(Tables.customer(spark, dir), "c_mktsegment", "c_acctbal"),
    Some("""
      SELECT c_mktsegment,
             CAST(sum(CAST(c_acctbal AS DECIMAL(30,8))) AS DOUBLE) / count(c_acctbal)
               AS mean_target
      FROM customer GROUP BY c_mktsegment
      ORDER BY mean_target DESC, c_mktsegment
    """.trim))

  /** A6: 50-bin histogram of l_extendedprice split by return flag. */
  val q33Histogram = HarnessQuery(
    "q33_histogram",
    (spark, dir) =>
      Eda.histogram(Tables.lineitem(spark, dir), "l_extendedprice",
        "l_returnflag", bins = 50),
    Some("""
      WITH b AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
                 FROM lineitem)
      SELECT CASE WHEN mx = mn THEN 0
                  ELSE CAST(least(floor((l_extendedprice - mn) / ((mx - mn) / 50.0)), 49.0) AS BIGINT)
             END AS bucket,
             l_returnflag, count(*) AS count
      FROM lineitem, b
      GROUP BY 1, 2 ORDER BY 1, 2
    """.trim))

  /** A3: exact distinct count (approx HLL column checked rows-only in
    * unit tests — HLL implementations differ across engines).
    */
  val q34DistinctCount = HarnessQuery(
    "q34_distinct_count",
    (spark, dir) =>
      Eda.distinctCount(Tables.orders(spark, dir), "o_custkey")
        .drop("n_distinct_approx"),
    Some("""
      SELECT count(DISTINCT o_custkey) AS n_distinct, count(*) AS n_rows
      FROM orders
    """.trim))

  /** A8: class-frequency audit on the embeddings label column. */
  val q35ClassFreq = HarnessQuery(
    "q35_class_freq",
    (spark, dir) =>
      Tables.embeddings(spark, dir)
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("count"))
        .orderBy(col("label")),
    Some("""
      SELECT CAST(label AS BIGINT) AS label, count(*) AS count
      FROM embeddings GROUP BY 1 ORDER BY 1
    """.trim))

  /** Hierarchical aggregation via ROLLUP (region -> nation -> total):
    * grouping-set coverage beyond the reference's flat groupBys.
    */
  val q36Rollup = HarnessQuery(
    "q36_rollup",
    (spark, dir) => {
      val n = Tables.nation(spark, dir)
      val c = Tables.customer(spark, dir)
      val r = Tables.region(spark, dir)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          Parity.dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },
    Some("""
      SELECT r_name, n_name, count(*) AS n_cust,
             CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS sum_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """.trim))

  /** Skew-safe grouped distinct count (two-stage rewrite) — exact parity
    * with the direct COUNT(DISTINCT) oracle.
    */
  val q37SkewDistinct = HarnessQuery(
    "q37_skew_distinct",
    (spark, dir) =>
      Eda.skewSafeCountDistinct(
        Tables.events(spark, dir), "event_type", "user_id"),
    Some("""
      SELECT event_type, count(DISTINCT user_id) AS n_distinct
      FROM events GROUP BY event_type ORDER BY event_type
    """.trim))

  /** Sketch accuracy audit — the 100 TB cardinality/quantile path:
    * HyperLogLog++ distinct (1% rsd, audited at a 5% band = 5x the rsd,
    * since rsd is a standard deviation, not a bound) and
    * approx_percentile vs their exact counterparts, per group. The
    * flags must be frozen for ANY partition layout the driver runs
    * with: HLL register-max merges are order-invariant, and the
    * quantile flag brackets the sketch between exact quantiles at 5x
    * its guaranteed rank error (eps = 1/accuracy), which holds under
    * every merge order by the GK mergeability bound — never compare an
    * order-sensitive sketch VALUE against a frozen constant.
    */
  val q38Sketches = HarnessQuery(
    "q38_sketches",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
      // single percentile buffer for both bounds — stacking two exact
      // percentile aggregates forces the sort-agg fallback (round-1
      // perf lesson)
      val exact = ev.groupBy(col("event_type")).agg(
        countDistinct(col("user_id")).as("n_exact"),
        expr("percentile(value, array(0.495, 0.505))").as("__p_arr"))
        .select(col("event_type"), col("n_exact"),
          element_at(col("__p_arr"), 1).as("__p_lo"),
          element_at(col("__p_arr"), 2).as("__p_hi"))
      val approx = ev.groupBy(col("event_type")).agg(
        approx_count_distinct(col("user_id"), 0.01).as("__n_approx"),
        expr("approx_percentile(value, 0.5, 1000)").as("__p50_approx"))
      exact.join(approx, Seq("event_type"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("__n_approx") - col("n_exact")).cast("double") /
            col("n_exact") <= 0.05).as("hll_ok"),
          (col("__p50_approx") >= col("__p_lo") &&
            col("__p50_approx") <= col("__p_hi")).as("p50_ok"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, count(DISTINCT user_id) AS n_exact,
             true AS hll_ok, true AS p50_ok
      FROM events GROUP BY 1 ORDER BY 1
    """.trim))

  /** Full CUBE over (event_type, weekday): all four grouping-set
    * combinations in one pass (GROUP BY CUBE lowers to Expand +
    * HashAggregate — no re-scan per grouping set).
    */
  val q39Cube = HarnessQuery(
    "q39_cube",
    (spark, dir) =>
      Tables.events(spark, dir)
        .withColumn("dow",
          graft.operators.TimeFeatures.dayOfWeekMon0(col("ts")))
        .cube(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n"),
          Parity.dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type").asc_nulls_first, col("dow").asc_nulls_first),
    Some("""
      SELECT event_type, isodow(ts) - 1 AS dow, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY CUBE (event_type, dow)
      ORDER BY event_type NULLS FIRST, dow NULLS FIRST
    """.trim))

  /** Per-column ingest profile ([[Eda.profile]]): nulls, exact
    * distincts, numeric min/max for every `events` column, one scan.
    * The oracle is a per-column UNION ALL of the same aggregates.
    */
  val q100Profile = HarnessQuery(
    "q100_profile",
    (spark, dir) => Eda.profile(Tables.events(spark, dir),
      Seq("event_id", "ts", "user_id", "event_type", "value")),
    Some("""
      SELECT 'event_id' AS col_name, count(*) AS n_rows,
             CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             count(DISTINCT event_id) AS n_distinct,
             CAST(min(event_id) AS DOUBLE) AS min_val, CAST(max(event_id) AS DOUBLE) AS max_val
      FROM events
      UNION ALL
      SELECT 'ts', count(*),
             CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT CAST(ts AS TIMESTAMP)), NULL, NULL
      FROM events
      UNION ALL
      SELECT 'user_id', count(*),
             CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT user_id),
             CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE)
      FROM events
      UNION ALL
      SELECT 'event_type', count(*),
             CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT event_type), NULL, NULL
      FROM events
      UNION ALL
      SELECT 'value', count(*),
             CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT value),
             CAST(min(value) AS DOUBLE), CAST(max(value) AS DOUBLE)
      FROM events
      ORDER BY 1
    """.trim))

  /** Winsorization ([[graft.operators.NumericFeatures.winsorize]]):
    * clamp event values into the exact [p01, p99] range, then audit the
    * clamped distribution per type — the oracle replays the same exact
    * percentiles via quantile_cont.
    */
  val q103Winsorize = HarnessQuery(
    "q103_winsorize",
    (spark, dir) => {
      val w = graft.operators.NumericFeatures
        .winsorize(Tables.events(spark, dir), "value")
      w.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          Parity.dsum(col("winsorized")).as("sum_w"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH p AS (SELECT quantile_cont(value, 0.01) AS lo,
                        quantile_cont(value, 0.99) AS hi
                 FROM events)
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(greatest(p.lo, least(p.hi, value))
                           AS DECIMAL(25,6))) AS DOUBLE) AS sum_w
      FROM events, p GROUP BY 1 ORDER BY 1
    """.trim))

  /** Per-group z-scores
    * ([[graft.operators.NumericFeatures.standardizeByKey]]): value
    * standardized within its event_type, per-row output — the oracle
    * recomputes mean/std from the same decimal sums and formula, so
    * every double matches bit-for-bit (rounded to 12 for transport).
    */
  val q104Zscore = HarnessQuery(
    "q104_zscore",
    (spark, dir) => {
      graft.operators.NumericFeatures
        .standardizeByKey(Tables.events(spark, dir), "event_type", "value")
        .select(col("event_id"), col("event_type"),
          round(col("zscore"), 12).as("z"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH s AS (SELECT event_type, count(value) AS n,
                        CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS sm,
                        CAST(sum(CAST(value * value AS DECIMAL(30,8))) AS DOUBLE) AS ss
                 FROM events GROUP BY 1)
      SELECT e.event_id, e.event_type,
             round((e.value - s.sm / s.n)
                   / nullif(sqrt((s.ss - s.sm * s.sm / s.n) / (s.n - 1)), 0.0),
                   12) AS z
      FROM events e JOIN s USING (event_type)
      ORDER BY 1
    """.trim))

  /** Per-group robust scaling
    * ([[graft.operators.NumericFeatures.robustScaleByKey]]):
    * (value − median) / IQR within each event_type — the heavy-tail-
    * safe sibling of q104's z-score, riding the exact-percentile
    * parity (Spark `percentile` ≡ DuckDB `quantile_cont`).
    */
  val q176RobustScale = HarnessQuery(
    "q176_robust_scale",
    (spark, dir) => {
      graft.operators.NumericFeatures
        .robustScaleByKey(Tables.events(spark, dir), "event_type", "value")
        .select(col("event_id"), col("event_type"),
          round(col("rscaled"), 9).as("rs"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH s AS (SELECT event_type,
                        quantile_cont("value", 0.25) AS q1,
                        quantile_cont("value", 0.5) AS med,
                        quantile_cont("value", 0.75) AS q3
                 FROM events GROUP BY 1)
      SELECT e.event_id, e.event_type,
             round((CAST(e."value" AS DOUBLE) - s.med)
                   / nullif(s.q3 - s.q1, 0.0), 9) AS rs
      FROM events e JOIN s USING (event_type)
      ORDER BY 1
    """.trim))

  /** Trending users per day ([[Eda.topKPerGroup]]): the top-3 most
    * active user_ids for each event day, ties to the lower id — the
    * rank runs over aggregated (day, user) counts, never raw events.
    */
  val q107Trending = HarnessQuery(
    "q107_trending",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .withColumn("day", to_date(col("ts")))
      Eda.topKPerGroup(ev, "day", "user_id", k = 3)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("rank"), col("user_id"), col("n"))
        .orderBy(col("day"), col("rank"))
    },
    Some("""
      WITH c AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                        user_id, count(*) AS n
                 FROM events GROUP BY 1, 2),
      r AS (SELECT day, user_id, n,
                   row_number() OVER (PARTITION BY day
                                      ORDER BY n DESC, user_id) AS rank
            FROM c)
      SELECT strftime(day, '%Y-%m-%d') AS day, CAST(rank AS BIGINT) AS rank,
             user_id, n
      FROM r WHERE rank <= 3 ORDER BY 1, 2
    """.trim))

  /** IQR outlier filter
    * ([[graft.operators.NumericFeatures.dropOutliersIqr]]): events
    * surviving Tukey's fence on value, audited per type — exact
    * quartiles replayed via quantile_cont.
    */
  val q108IqrFilter = HarnessQuery(
    "q108_iqr_filter",
    (spark, dir) => {
      graft.operators.NumericFeatures
        .dropOutliersIqr(Tables.events(spark, dir), "value")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          Parity.dsum(col("value")).as("sum_v"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH q AS (SELECT quantile_cont(value, 0.25) AS q1,
                        quantile_cont(value, 0.75) AS q3
                 FROM events)
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_v
      FROM events, q
      WHERE value IS NULL
         OR (value >= q.q1 - 1.5 * (q.q3 - q.q1)
             AND value <= q.q3 + 1.5 * (q.q3 - q.q1))
      GROUP BY 1 ORDER BY 1
    """.trim))

  /** Benford's-law first-digit audit ([[Eda.benfordAudit]] on event
    * values by type): observed vs expected digit distribution + the
    * chi-square statistic, every number decimal-exact. The leading
    * digit derives from the exact DECIMAL(18,6) rendering (no libm
    * log10), so both engines classify every value identically.
    */
  val q145BenfordAudit = HarnessQuery(
    "q145_benford_audit",
    (spark, dir) =>
      Eda.benfordAudit(Tables.events(spark, dir), "value", "event_type")
        .orderBy(col("event_type"), col("digit")),
    Some {
      val fracRows = (1 to 9).map(d =>
        s"('$d', CAST(${math.log10(1.0 + 1.0 / d)} AS DOUBLE))").mkString(", ")
      s"""
      WITH src AS (
        SELECT event_type,
               regexp_extract(CAST(CAST(value AS DECIMAL(18,6)) AS VARCHAR),
                 '[1-9]', 0) AS digit
        FROM events),
      obs AS (SELECT event_type, digit, count(*) AS n_obs
              FROM src WHERE digit <> '' GROUP BY 1, 2),
      tot AS (SELECT event_type, CAST(sum(n_obs) AS BIGINT) AS n_total
              FROM obs GROUP BY 1),
      fr(digit, benford_frac) AS (VALUES $fracRows),
      grid AS (SELECT t.event_type, t.n_total, CAST(d.d AS VARCHAR) AS digit
               FROM tot t, generate_series(1, 9) d(d)),
      j AS (SELECT g.event_type, g.digit,
                   coalesce(o.n_obs, 0) AS n_obs, g.n_total, f.benford_frac,
                   g.n_total * f.benford_frac AS e
            FROM grid g
            LEFT JOIN obs o ON o.event_type = g.event_type AND o.digit = g.digit
            JOIN fr f ON f.digit = g.digit),
      t2 AS (SELECT *, (n_obs - e) * (n_obs - e) / e AS term FROM j)
      SELECT event_type, digit, CAST(n_obs AS BIGINT) AS n_obs, n_total,
             round(benford_frac, 12) AS benford_frac,
             round(term, 12) AS chi2_term,
             round(CAST(sum(CAST(term AS DECIMAL(30,15)))
               OVER (PARTITION BY event_type) AS DOUBLE), 12) AS chi2
      FROM t2 ORDER BY event_type, digit
      """.trim
    })

  def all: Seq[HarnessQuery] = Seq(
    q30Describe, q31ValueCounts, q32GroupedMean, q33Histogram,
    q34DistinctCount, q35ClassFreq, q36Rollup, q37SkewDistinct,
    q38Sketches, q39Cube, q100Profile, q103Winsorize, q104Zscore,
    q107Trending, q108IqrFilter, q145BenfordAudit, q176RobustScale)
}

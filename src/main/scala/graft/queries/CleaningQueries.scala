package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.IpFunctions
import graft.operators.Cleaning
import graft.sources.Tables

/** M1: cleaning + scalar-conversion operators (SURVEY.md §2.2/§2.3) as
  * oracle-checked queries over `events`.
  *
  * DuckDB type parity notes: DuckDB `sum(BIGINT)` is HUGEINT — every
  * oracle casts sums back to BIGINT; Spark integer-ish outputs are cast
  * to LongType to match DuckDB's BIGINT-by-default arithmetic.
  */
object CleaningQueries {

  /** P1/A4: null audit — per-column null counts + row count, one row. */
  val q10NullAudit = HarnessQuery(
    "q10_null_audit",
    (spark, dir) =>
      Cleaning.nullAudit(
        Tables.events(spark, dir), Seq("value", "props", "event_type")),
    Some("""
      SELECT CAST(count(*) - count(value) AS BIGINT) AS value_nulls,
             CAST(count(*) - count(props) AS BIGINT) AS props_nulls,
             CAST(count(*) - count(event_type) AS BIGINT) AS event_type_nulls,
             count(*) AS n_rows
      FROM events
    """.trim))

  /** P2 + predicate: drop-null filter composed with a pushed-down value
    * predicate, then aggregate.
    */
  val q11DropNullFilter = HarnessQuery(
    "q11_drop_null_filter",
    (spark, dir) => {
      val ev = Cleaning.dropNullRows(Tables.events(spark, dir), Seq("value"))
      ev.filter(col("value") > 5.0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), Parity.dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      FROM events
      WHERE value IS NOT NULL AND value > 5.0
      GROUP BY event_type ORDER BY event_type
    """.trim))

  /** P4: whole-row distinct over a projection. */
  val q12Dedup = HarnessQuery(
    "q12_dedup",
    (spark, dir) =>
      Cleaning.dedup(
        Tables.events(spark, dir).select(col("event_type"), col("user_id")))
        .orderBy(col("event_type"), col("user_id")),
    Some("""
      SELECT DISTINCT event_type, user_id FROM events
      ORDER BY event_type, user_id
    """.trim))

  /** P4 keyed: deterministic first-event-per-user dedup. */
  val q13DedupByKey = HarnessQuery(
    "q13_dedup_by_key",
    (spark, dir) =>
      Cleaning.dedupByKey(
        Tables.events(spark, dir),
        Seq("user_id"), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_id"), col("value"))
        .orderBy(col("user_id")),
    Some("""
      SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events) t
      WHERE rn = 1 ORDER BY user_id
    """.trim))

  /** F1/F2/P8: IPv4 string <-> uint32 round trip, both parse paths
    * (dotted-quad and numeric-string), as pure Column expressions.
    */
  val q14IpRoundtrip = HarnessQuery(
    "q14_ip_roundtrip",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .withColumn("ip", concat_ws(".",
          pmod(col("user_id"), lit(200L)),
          pmod(col("event_id"), lit(256L)),
          lit(3L), lit(4L)))
      ev.select(
          col("event_id"),
          col("ip"),
          IpFunctions.ipToInt(col("ip")).as("ip_int"),
          IpFunctions.intToIp(IpFunctions.ipToInt(col("ip"))).as("ip_back"),
          IpFunctions.ipToInt(concat(col("event_id") * 37, lit(".5")))
            .as("num_int"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id,
             (user_id % 200)::VARCHAR || '.' || (event_id % 256)::VARCHAR || '.3.4' AS ip,
             (user_id % 200) * 16777216 + (event_id % 256) * 65536 + 3 * 256 + 4 AS ip_int,
             (user_id % 200)::VARCHAR || '.' || (event_id % 256)::VARCHAR || '.3.4' AS ip_back,
             CAST(TRUNC(TRY_CAST(event_id * 37 || '.5' AS DOUBLE)) AS BIGINT) AS num_int
      FROM events ORDER BY event_id
    """.trim))

  /** P3: timestamp coercion — format then reparse keeps microsecond
    * fidelity; unparseable strings coerce to null, not error (ANSI-safe).
    */
  val q15TimestampCoerce = HarnessQuery(
    "q15_timestamp_coerce",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .withColumn("s", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .withColumn("bad", col("props"))
      Cleaning.coerceTimestamps(ev, Seq("s", "bad"))
        .select(
          col("event_id"),
          unix_micros(col("s")).as("parsed_us"),
          col("bad").isNull.cast("long").as("bad_is_null"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS parsed_us,
             CAST(CASE WHEN TRY_CAST(props AS TIMESTAMP) IS NULL THEN 1 ELSE 0 END AS BIGINT) AS bad_is_null
      FROM events ORDER BY event_id
    """.trim))

  /** P2 'impute' strategy ([[Cleaning.imputeMean]]): the testdata has no
    * natural nulls, so the query plants a deterministic null pattern
    * (value of every 'error' event), mean-fills it, and aggregates per
    * type — the filled groups must sum to exactly n × mean of the
    * surviving values, which the oracle replays with the same decimal
    * mean formula.
    */
  val q80ImputeMean = HarnessQuery(
    "q80_impute_mean",
    (spark, dir) => {
      val planted = Tables.events(spark, dir)
        .withColumn("value",
          when(col("event_type") === "error", lit(null).cast("double"))
            .otherwise(col("value")))
      Cleaning.imputeMean(planted, Seq("value"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), Parity.dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (
        SELECT event_type,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value
        FROM events),
      m AS (
        SELECT CAST(sum(CAST(value AS DECIMAL(30,12))) AS DOUBLE) / count(value) AS mean
        FROM e)
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(coalesce(value, (SELECT mean FROM m)) AS DECIMAL(25,6)))
               AS DOUBLE) AS sum_value
      FROM e GROUP BY 1 ORDER BY 1
    """.trim))

  /** P2 'impute_median' ([[Cleaning.imputeMedian]]): same planted null
    * pattern, exact-median fill. Group min/max (not sums) make the
    * check: the filled group's min = max = the median of the surviving
    * values. Rounded to 9 decimals because continuous-quantile
    * interpolation (`a + (b-a)/2` vs `(a+b)/2`) may differ by 1 ulp
    * between engines.
    */
  val q81ImputeMedian = HarnessQuery(
    "q81_impute_median",
    (spark, dir) => {
      val planted = Tables.events(spark, dir)
        .withColumn("value",
          when(col("event_type") === "error", lit(null).cast("double"))
            .otherwise(col("value")))
      Cleaning.imputeMedian(planted, Seq("value"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(min(col("value")), 9).as("min_value"),
          round(max(col("value")), 9).as("max_value"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (
        SELECT event_type,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value
        FROM events),
      m AS (SELECT quantile_cont(value, 0.5) AS med FROM e)
      SELECT event_type, count(*) AS n,
             round(min(coalesce(value, (SELECT med FROM m))), 9) AS min_value,
             round(max(coalesce(value, (SELECT med FROM m))), 9) AS max_value
      FROM e GROUP BY 1 ORDER BY 1
    """.trim))

  /** P7 ([[Cleaning.findTargetColumn]], processor.py:25-28) under the
    * oracle: sniff the target/label column of every testdata table by
    * candidate priority (`class` > `Class` > `label`, else `none`) from
    * a schema-only probe (parquet footer; no job reads data). The
    * oracle re-derives the same answer from DuckDB's view metadata
    * (`pragma_table_info`), so the sniffed name is checked against an
    * independent schema reading — closing the last spec-only §2 row.
    */
  val q337TargetSniff = HarnessQuery(
    "q337_target_sniff",
    (spark, dir) => {
      import spark.implicits._
      val names = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      names.map { n =>
          val t = Tables.load(spark, dir, n)
          (n, Cleaning.findTargetColumn(t, Seq("class", "Class", "label"))
            .getOrElse("none"))
        }
        .toDF("table_name", "target_col")
        .orderBy(col("table_name"))
    },
    Some("""
      WITH cols AS (
        SELECT 'region' AS table_name, name FROM pragma_table_info('region')
        UNION ALL SELECT 'nation', name FROM pragma_table_info('nation')
        UNION ALL SELECT 'customer', name FROM pragma_table_info('customer')
        UNION ALL SELECT 'supplier', name FROM pragma_table_info('supplier')
        UNION ALL SELECT 'part', name FROM pragma_table_info('part')
        UNION ALL SELECT 'orders', name FROM pragma_table_info('orders')
        UNION ALL SELECT 'lineitem', name FROM pragma_table_info('lineitem')
        UNION ALL SELECT 'events', name FROM pragma_table_info('events')
        UNION ALL SELECT 'documents', name FROM pragma_table_info('documents')
        UNION ALL SELECT 'embeddings', name FROM pragma_table_info('embeddings'))
      SELECT table_name,
             coalesce(
               max(CASE WHEN name = 'class' THEN 'class' END),
               max(CASE WHEN name = 'Class' THEN 'Class' END),
               max(CASE WHEN name = 'label' THEN 'label' END),
               'none') AS target_col
      FROM cols GROUP BY 1 ORDER BY 1
    """.trim))

  def all: Seq[HarnessQuery] = Seq(
    q10NullAudit, q11DropNullFilter, q12Dedup, q13DedupByKey,
    q14IpRoundtrip, q15TimestampCoerce, q80ImputeMean, q81ImputeMedian,
    q337TargetSniff, q432JsonKeyProfile)

  /** JSON key profile ([[Cleaning.jsonKeyProfile]]): schema discovery
    * over a semi-structured column — per top-level key, presence count
    * and row share. The fixture enriches `events` into real
    * conditional-key JSON via to_json (null fields drop, so `amount`/
    * `tag`/`meta` appear only when their rules fire; `meta` is a
    * nested object counted as ONE top-level key); Spark parses it back
    * with json_object_keys, while the oracle recomputes presence from
    * the generation rules — parse-vs-rules agreement IS the check.
    */
  val q432JsonKeyProfile = HarnessQuery(
    "q432_json_key_profile",
    (spark, dir) => {
      val enriched = Tables.events(spark, dir).select(
        to_json(struct(
          col("event_id").as("id"),
          col("value").as("v"),
          when(col("event_type") === "purchase", col("value"))
            .as("amount"),
          when(pmod(col("user_id"), lit(3)) === 0, col("event_type"))
            .as("tag"),
          when(pmod(col("user_id"), lit(5)) === 0,
            struct(col("user_id").as("u"))).as("meta"))).as("j"))
      Cleaning.jsonKeyProfile(enriched, "j").orderBy(col("key"))
    },
    Some("""
      WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events),
      k AS (
        SELECT 'id' AS key, CAST(count(*) AS BIGINT) AS n_present
        FROM events
        UNION ALL
        SELECT 'v', CAST(count(*) AS BIGINT) FROM events
        WHERE value IS NOT NULL
        UNION ALL
        SELECT 'amount', CAST(count(*) AS BIGINT) FROM events
        WHERE event_type = 'purchase' AND value IS NOT NULL
        UNION ALL
        SELECT 'tag', CAST(count(*) AS BIGINT) FROM events
        WHERE user_id % 3 = 0
        UNION ALL
        SELECT 'meta', CAST(count(*) AS BIGINT) FROM events
        WHERE user_id % 5 = 0)
      SELECT key, n_present,
             floor(CAST(n_present AS DOUBLE) / CAST(n AS DOUBLE) * 1e9)
               / 1e9 AS share
      FROM k, t ORDER BY key
    """.trim))
}

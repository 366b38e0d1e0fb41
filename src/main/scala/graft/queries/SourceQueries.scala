package graft.queries

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Parity._
import graft.sources.{CsvSource, PipelineConfig, Tables}

/** Harness coverage for the source rows that previously rested on unit
  * fixtures alone: S1 (CSV scan, reference `load_data.py:19-55`) and S2
  * (YAML config, reference `config_loader.py:3-5`). Each query writes
  * its own small input into a temp dir, round-trips it through the real
  * source implementation, and aggregates — the oracle computes the same
  * aggregate straight from the parquet tables, so a lossy or mis-parsed
  * round-trip hash-mismatches.
  */
object SourceQueries {

  private val customerCsv: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  /** S1: parquet → CSV (header) → [[CsvSource.read]] with an explicit
    * schema → per-segment aggregate. Doubles survive because Spark's
    * CSV writer emits the shortest round-trip representation and the
    * typed read parses it back to the identical bit pattern; the
    * decimal-sum parity discipline then makes the aggregate
    * order-independent. If the CSV path dropped precision, rows, or
    * misaligned columns, the hash against the parquet-side oracle
    * breaks.
    */
  val q159CsvRoundtrip = HarnessQuery(
    "q159_csv_roundtrip",
    (spark, dir) => {
      val tmp = Files.createTempDirectory("graft_q159").toFile
      tmp.deleteOnExit()
      val csvDir = new java.io.File(tmp, "customer_csv").getPath
      Tables.customer(spark, dir)
        .write.mode("overwrite").option("header", "true").csv(csvDir)
      CsvSource.read(spark, csvDir, customerCsv)
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("c_acctbal")).as("sum_bal"),
          countDistinct(col("c_nationkey")).as("n_nations"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      SELECT c_mktsegment,
             count(*) AS n,
             CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS sum_bal,
             CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations
      FROM customer GROUP BY 1 ORDER BY 1
    """.trim))

  /** S2: write a pipeline YAML (inline feature lists, non-default
    * test_size/random_state), parse it with [[PipelineConfig.fromYaml]],
    * and let every parsed field drive a computation over `customer`:
    * the feature lists pick the columns, test_size sizes the split,
    * random_state lands as a row. The oracle hard-codes the YAML's
    * values — any parse drift (defaults leaking through, list order
    * lost, numbers as strings) mismatches.
    */
  val q160YamlConfig = HarnessQuery(
    "q160_yaml_config",
    (spark, dir) => {
      val yaml =
        """test_size: 0.25
          |random_state: 7
          |missing_value_strategy: drop
          |imbalance_strategy: undersample
          |numerical_features: [c_acctbal]
          |categorical_features: [c_mktsegment]
          |""".stripMargin
      val f = Files.createTempFile("graft_q160", ".yaml")
      Files.write(f, yaml.getBytes(StandardCharsets.UTF_8))
      f.toFile.deleteOnExit()
      val cfg = PipelineConfig.fromYaml(f.toString)
      require(cfg.missingValueStrategy == "drop"
        && cfg.imbalanceStrategy == "undersample",
        s"yaml strategy keys mis-parsed: $cfg")
      val cust = Tables.customer(spark, dir)
      val numStats = cfg.numericalFeatures.map(c =>
        cust.agg(dmean(col(c)).as("stat"))
          .select(lit(s"mean:$c").as("feature"), col("stat")))
      val catStats = cfg.categoricalFeatures.map(c =>
        cust.agg(countDistinct(col(c)).cast("double").as("stat"))
          .select(lit(s"distinct:$c").as("feature"), col("stat")))
      val splitStats = cust.agg(
          ceil(count(lit(1)) * lit(cfg.testSize)).cast("double").as("stat"))
        .select(lit("test_rows").as("feature"), col("stat"))
      val seedRow = cust.limit(1).select(
        lit("random_state").as("feature"),
        lit(cfg.randomState).cast("double").as("stat"))
      (numStats ++ catStats :+ splitStats :+ seedRow)
        .reduce(_.unionByName(_))
        .orderBy(col("feature"))
    },
    Some("""
      SELECT 'mean:c_acctbal' AS feature,
             CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
               / count(c_acctbal) AS stat
      FROM customer
      UNION ALL
      SELECT 'distinct:c_mktsegment',
             CAST(count(DISTINCT c_mktsegment) AS DOUBLE) FROM customer
      UNION ALL
      SELECT 'test_rows', CAST(ceil(count(*) * 0.25) AS DOUBLE) FROM customer
      UNION ALL
      SELECT 'random_state', 7.0
      ORDER BY feature
    """.trim))

  /** Partitioned-sink roundtrip ([[graft.sources.Layout
    * .writePartitioned]]): events written partitionBy(event_type) into
    * the query's temp dir (salted within each partition value so a
    * skewed type doesn't funnel one task), then read back through a
    * partition-pruned scan (filter on the partition column) and
    * aggregated. The oracle aggregates the same slice straight from
    * the source table — layout must be lossless and the pruned read
    * complete for the hash to match. The partition column itself
    * round-trips through directory names (value → path → value), so
    * type fidelity is part of what's under test.
    */
  val q227PartitionedSink = HarnessQuery(
    "q227_partitioned_sink",
    (spark, dir) => {
      val tmp = Files.createTempDirectory("graft_q227").toFile
      tmp.deleteOnExit()
      val out = new java.io.File(tmp, "events_by_type").getPath
      graft.sources.Layout.writePartitioned(
        Tables.events(spark, dir), out,
        partCol = "event_type", sortCol = "ts")
      spark.read.schema(Tables.events)
        .option("basePath", out).parquet(out)
        .where(col("event_type").isin("click", "purchase"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("value")).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"),
          max(unix_micros(col("ts"))).as("max_ts_us"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type,
             count(*) AS n,
             CAST(sum(CAST("value" AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             max(epoch_us(CAST(ts AS TIMESTAMP))) AS max_ts_us
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1 ORDER BY 1
    """.trim))

  /** Schema-evolution read: two parquet batches with DIFFERENT
    * schemas (an early export without `user_id`, a later one without
    * `value`) land in the same directory tree; `mergeSchema` unifies
    * them and the aggregate proves no column silently dropped or
    * null-filled on the wrong side. This is the source-side contract
    * a long-lived 100 TB dataset lives by — schemas drift across
    * vintages and the reader must reconcile, not reject.
    */
  val q233SchemaEvolution = HarnessQuery(
    "q233_schema_evolution",
    (spark, dir) => {
      val tmp = Files.createTempDirectory("graft_q233").toFile
      tmp.deleteOnExit()
      val base = new java.io.File(tmp, "evolved").getPath
      val ev = Tables.events(spark, dir)
      ev.where(col("event_id") % 2 === 0)
        .select(col("event_id"), col("event_type"), col("value"))
        .write.mode("overwrite").parquet(s"$base/batch=v1")
      ev.where(col("event_id") % 2 =!= 0)
        .select(col("event_id"), col("event_type"), col("user_id"))
        .write.mode("overwrite").parquet(s"$base/batch=v2")
      spark.read.option("mergeSchema", "true").parquet(base)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          count(col("value")).as("n_value"),
          count(col("user_id")).as("n_user"),
          dsum(col("value")).as("sum_value"),
          sum(col("user_id")).as("sum_user"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type,
             count(*) AS n,
             CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_value,
             CAST(sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_user,
             CAST(sum(CASE WHEN event_id % 2 = 0
               THEN CAST("value" AS DECIMAL(25,6)) END) AS DOUBLE)
               AS sum_value,
             CAST(sum(CASE WHEN event_id % 2 <> 0 THEN user_id END)
               AS BIGINT) AS sum_user
      FROM events GROUP BY 1 ORDER BY 1
    """.trim))

  /** S1 sibling for the columnar-source matrix: parquet → ORC →
    * typed read → per-status aggregate. ORC is the other splittable
    * columnar format a 100 TB lake actually serves (predicate pushdown
    * and column pruning work the same as parquet via the native
    * reader); doubles and timestamps survive because ORC stores them
    * binary — no text round-trip at all. The oracle aggregates the
    * original parquet, so any type drift, row loss, or column
    * misalignment through the ORC hop breaks the hash.
    */
  val q391OrcRoundtrip = HarnessQuery(
    "q391_orc_roundtrip",
    (spark, dir) => {
      val tmp = Files.createTempDirectory("graft_q391").toFile
      tmp.deleteOnExit()
      val orcDir = new java.io.File(tmp, "orders_orc").getPath
      Tables.orders(spark, dir)
        .write.mode("overwrite").orc(orcDir)
      spark.read.orc(orcDir)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("sum_price"),
          countDistinct(col("o_custkey")).as("n_custs"),
          unix_micros(max(col("o_orderdate"))).as("last_date_us"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""
      SELECT o_orderstatus,
             count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
               AS sum_price,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
             epoch_us(max(o_orderdate)) AS last_date_us
      FROM orders GROUP BY 1 ORDER BY 1
    """.trim))

  def all: Seq[HarnessQuery] =
    Seq(q159CsvRoundtrip, q160YamlConfig, q227PartitionedSink,
      q233SchemaEvolution, q391OrcRoundtrip)
}

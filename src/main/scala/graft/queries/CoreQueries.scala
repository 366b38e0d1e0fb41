package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.RangeJoin

/** Shared numeric-parity helpers for all harness queries. */
object Parity {
  /** Exact, order-independent sum of a double column: decimal-accumulate,
    * double out. DuckDB twin: CAST(sum(CAST(x AS DECIMAL(25,6))) AS DOUBLE).
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(25,6)")).cast("double")

  /** Exact mean: decimal sum / exact count, evaluated in double. DuckDB
    * twin: CAST(sum(CAST(x AS DECIMAL(25,6))) AS DOUBLE) / count(x).
    */
  def dmean(c: Column): Column = dsum(c) / count(c)
}

/** M0 vertical slice: scan -> filter -> join -> aggregate -> sink. */
object CoreQueries {
  import Parity._

  /** A1/A2-style pricing summary over lineitem (TPC-H Q1 shape): grouped
    * sums/means/counts with a date filter that must push down to parquet.
    */
  val q01PricingSummary = HarnessQuery(
    "q01_pricing_summary",
    (spark, dir) => {
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") <= lit("1996-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          dmean(col("l_quantity")).as("avg_qty"),
          dmean(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
             CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / count(l_quantity) AS avg_qty,
             CAST(sum(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / count(l_discount) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1996-12-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """.trim))

  /** J1: broadcast range join (the as-of geolocation shape,
    * reference transform_data.py:25-47) — events matched into derived
    * integer ranges with gaps; misses coalesce to the 'Unknown' sentinel.
    */
  val q02RangeJoin = HarnessQuery(
    "q02_range_join",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .withColumn("uk", pmod(col("user_id"), lit(1000L)))
      val ranges = Tables.nation(spark, dir).select(
        col("n_name"),
        (col("n_nationkey").cast("long") * 40L).as("lb"),
        (col("n_nationkey").cast("long") * 40L + 29L).as("ub"))
      RangeJoin.rangeJoin(ev, ranges, "uk", "lb", "ub")
        .withColumn("country", coalesce(col("n_name"), lit("Unknown")))
        .groupBy(col("country"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy(col("country"))
    },
    Some("""
      SELECT coalesce(n_name, 'Unknown') AS country,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      FROM events LEFT JOIN
        (SELECT n_name, n_nationkey * 40 AS lb, n_nationkey * 40 + 29 AS ub
         FROM nation) r
        ON (user_id % 1000) >= lb AND (user_id % 1000) <= ub
      GROUP BY 1 ORDER BY 1
    """.trim))

  /** J2: multi-way equi-join over the star schema; dims broadcast. */
  val q03StarJoin = HarnessQuery(
    "q03_star_join",
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
      val c = Tables.customer(spark, dir)
      val n = Tables.nation(spark, dir)
      val r = Tables.region(spark, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("r_name"))
    },
    Some("""
      SELECT r_name, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name
    """.trim))

  /** O-limit: global top-k — plans as TakeOrderedAndProject (per-partition
    * heap + driver merge), never a full global sort.
    */
  val q04TopK = HarnessQuery(
    "q04_topk",
    (spark, dir) =>
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100),
    Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """.trim))

  /** J2 variants: left-semi (EXISTS) and left-anti (NOT EXISTS). */
  val q05SemiAnti = HarnessQuery(
    "q05_semi_anti",
    (spark, dir) => {
      val c = Tables.customer(spark, dir)
      val o = Tables.orders(spark, dir).select(col("o_custkey"))
      val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      semi.agg(count(lit(1)).as("n_with_orders"))
        .crossJoin(anti.agg(count(lit(1)).as("n_without_orders")))
    },
    Some("""
      SELECT
        (SELECT count(*) FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_with_orders,
        (SELECT count(*) FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_without_orders
    """.trim))

  /** Set operations (§2.8): distinct union / intersect / except over key
    * projections.
    */
  val q06SetOps = HarnessQuery(
    "q06_set_ops",
    (spark, dir) => {
      val a = Tables.orders(spark, dir).select(col("o_custkey").as("k"))
      val b = Tables.customer(spark, dir)
        .filter(col("c_acctbal") > 0).select(col("c_custkey").as("k"))
      a.union(b).distinct().agg(count(lit(1)).as("n_union"))
        .crossJoin(a.intersect(b).agg(count(lit(1)).as("n_intersect")))
        .crossJoin(a.except(b).agg(count(lit(1)).as("n_except")))
    },
    Some("""
      SELECT
        (SELECT count(*) FROM (SELECT o_custkey AS k FROM orders UNION
                               SELECT c_custkey FROM customer WHERE c_acctbal > 0) u) AS n_union,
        (SELECT count(*) FROM (SELECT o_custkey AS k FROM orders INTERSECT
                               SELECT c_custkey FROM customer WHERE c_acctbal > 0) i) AS n_intersect,
        (SELECT count(*) FROM (SELECT DISTINCT o_custkey AS k FROM orders
                               WHERE o_custkey NOT IN
                                 (SELECT c_custkey FROM customer WHERE c_acctbal > 0)) e) AS n_except
    """.trim))

  def all: Seq[HarnessQuery] = Seq(
    q01PricingSummary, q02RangeJoin, q03StarJoin, q04TopK, q05SemiAnti,
    q06SetOps)
}

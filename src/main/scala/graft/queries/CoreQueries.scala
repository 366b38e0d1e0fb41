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

  /** J1 exact backward as-of join (merge_asof parity: greatest lb <=
    * value even past the range's end) — DuckDB's native ASOF JOIN is the
    * oracle.
    */
  val q07AsOfJoin = HarnessQuery(
    "q07_asof_join",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .withColumn("uk", pmod(col("user_id") * 7 + col("event_id"), lit(1000L)))
      val marks = Tables.nation(spark, dir).select(
        col("n_name"),
        (col("n_nationkey").cast("long") * 37L + 5L).as("lb"))
      RangeJoin.asOfJoinBackward(ev, marks, "uk", "lb", "event_id")
        .select(col("event_id"), col("uk"),
          coalesce(col("n_name"), lit("none")).as("mark"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, uk, coalesce(n_name, 'none') AS mark
      FROM (SELECT event_id, (user_id * 7 + event_id) % 1000 AS uk FROM events) e
      ASOF LEFT JOIN
        (SELECT n_name, n_nationkey * 37 + 5 AS lb FROM nation) r
        ON e.uk >= r.lb
      ORDER BY event_id
    """.trim))

  /** J1 at scale: the prefix-bucket rewrite of the range join — same
    * answer as q02's broadcast plan, but through an equi-join on minted
    * bucket keys (the plan that survives a large range table).
    */
  val q08BucketedRange = HarnessQuery(
    "q08_bucketed_range",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .withColumn("uk", pmod(col("user_id"), lit(1000L)))
      val ranges = Tables.nation(spark, dir).select(
        col("n_name"),
        (col("n_nationkey").cast("long") * 40L).as("lb"),
        (col("n_nationkey").cast("long") * 40L + 29L).as("ub"))
      RangeJoin.bucketedRangeJoin(ev, ranges, "uk", "lb", "ub", shiftBits = 5)
        .withColumn("country", coalesce(col("n_name"), lit("Unknown")))
        .groupBy(col("country"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy(col("country"))
    },
    q02RangeJoin.oracle)

  /** The general as-of join's `nearest` direction with a tolerance bound
    * ([[RangeJoin.asOfJoin]]): nearest mark within 19, equidistant ties
    * to the backward candidate (pandas `merge_asof` parity), out-of-
    * tolerance rows keep the 'none' sentinel. Marks sit 38 apart, so a
    * tolerance of exactly half the spacing makes BOTH paths live in the
    * data: midpoints (lb+19) have two equidistant candidates and
    * exercise the backward tie-break, while uk beyond the last mark+19
    * exercises the miss path. (A tolerance below half-spacing would
    * make ties impossible and the tie-break dead code.)
    */
  val q97AsOfNearest = HarnessQuery(
    "q97_asof_nearest",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .withColumn("uk", pmod(col("user_id") * 7 + col("event_id"), lit(1000L)))
      val marks = Tables.nation(spark, dir).select(
        col("n_name"),
        (col("n_nationkey").cast("long") * 38L + 5L).as("lb"))
      RangeJoin.asOfJoin(ev, marks, "uk", "lb", "event_id",
        direction = "nearest", tolerance = Some(19L))
        .select(col("event_id"), col("uk"),
          coalesce(col("n_name"), lit("none")).as("mark"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, uk, coalesce(n_name, 'none') AS mark
      FROM (SELECT event_id, (user_id * 7 + event_id) % 1000 AS uk FROM events) e
      LEFT JOIN (SELECT n_name, n_nationkey * 38 + 5 AS lb FROM nation) r
        ON abs(e.uk - r.lb) <= 19
      QUALIFY row_number() OVER (
        PARTITION BY event_id
        ORDER BY abs(uk - lb), CASE WHEN lb <= uk THEN 0 ELSE 1 END) = 1
      ORDER BY event_id
    """.trim))

  /** Salted skew join ([[graft.operators.SkewJoin.saltedJoin]]): events
    * fan onto 25 nation keys — a hot-key shape where a plain shuffle
    * join serializes each key through one task. The salt spreads every
    * key over 8 tasks; the oracle is the UNSALTED join, proving salting
    * is invisible to semantics.
    */
  val q98SaltedJoin = HarnessQuery(
    "q98_salted_join",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .withColumn("nk", pmod(col("user_id"), lit(25L)))
      val nations = Tables.nation(spark, dir)
        .select(col("n_nationkey").cast("long").as("nk"), col("n_name"))
      graft.operators.SkewJoin
        .saltedJoin(ev, nations, Seq("nk"), col("event_id"), salts = 8)
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy(col("n_name"))
    },
    Some("""
      SELECT n_name, count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      FROM (SELECT user_id % 25 AS nk, value FROM events) e
      JOIN (SELECT n_nationkey AS nk, n_name FROM nation) n USING (nk)
      GROUP BY 1 ORDER BY 1
    """.trim))

  /** Correlation / covariance aggregates from exact decimal sums — the
    * describe-adjacent second-moment statistics.
    */
  val q09Corr = HarnessQuery(
    "q09_corr",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
      def d(c: Column) = c.cast("decimal(30,8)")
      val n = count(lit(1)).cast("double")
      val sx = sum(d(col("l_quantity"))).cast("double")
      val sy = sum(d(col("l_extendedprice"))).cast("double")
      val sxy = sum(d(col("l_quantity") * col("l_extendedprice"))).cast("double")
      val sxx = sum(d(col("l_quantity") * col("l_quantity"))).cast("double")
      val syy = sum(d(col("l_extendedprice") * col("l_extendedprice"))).cast("double")
      li.groupBy(col("l_returnflag"))
        .agg(
          round((n * sxy - sx * sy) /
            sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 10).as("corr_qty_price"),
          round((n * sxy - sx * sy) / (n * (n - 1)), 6).as("covar_qty_price"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
             round((n * sxy - sx * sy) /
               sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 10) AS corr_qty_price,
             round((n * sxy - sx * sy) / (n * (n - 1)), 6) AS covar_qty_price
      FROM (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sx,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS sy,
               CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS sxy,
               CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_returnflag) t
      ORDER BY l_returnflag
    """.trim))

  /** Bloom-pruned fact-dimension join ([[graft.operators.SkewJoin
    * .bloomPrunedJoin]]): orders pre-filtered by a codegen'd Bloom
    * probe over the high-balance customers' keys before the shuffle
    * join. The oracle is the PLAIN join — the operator's contract is
    * exact equality for any fpp (false positives die in the real join),
    * which is precisely what the differential check pins.
    */
  val q347BloomJoin = HarnessQuery(
    "q347_bloom_join",
    (spark, dir) => {
      val ords = Tables.orders(spark, dir)
      val cust = Tables.customer(spark, dir)
        .filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      graft.operators.SkewJoin.bloomPrunedJoin(ords, cust, "o_custkey",
        fpp = 0.01)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      SELECT c_mktsegment, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_acctbal > 9000
      GROUP BY 1 ORDER BY 1
    """.trim))

  def all: Seq[HarnessQuery] = Seq(
    q01PricingSummary, q02RangeJoin, q03StarJoin, q04TopK, q05SemiAnti,
    q06SetOps, q07AsOfJoin, q08BucketedRange, q09Corr, q97AsOfNearest,
    q98SaltedJoin, q347BloomJoin)
}

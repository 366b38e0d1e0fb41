package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Expectations, Merge, Privacy, TimeFeatures, Velocity}
import graft.sources.Tables

/** Data-quality and temporal-profile queries over the star schema and
  * events — the audit layer a warehouse runs before training ever
  * starts: referential integrity across FK edges, inter-arrival
  * profiles, and per-entity burst detection.
  */
object QualityQueries {

  /** Referential-integrity audit ([[Expectations.fkAudit]]) across the
    * star schema's FK edges plus the deliberately-unconstrained
    * events.user_id → customer edge (events users outnumber customers
    * at small sf, so the audit provably reports non-zero orphans — an
    * audit that cannot fail proves nothing).
    */
  val q163FkAudit = HarnessQuery(
    "q163_fk_audit",
    (spark, dir) =>
      Expectations.fkAudit(Seq(
        Expectations.FkCheck("orders.o_custkey->customer",
          Tables.orders(spark, dir), "o_custkey",
          Tables.customer(spark, dir), "c_custkey"),
        Expectations.FkCheck("lineitem.l_orderkey->orders",
          Tables.lineitem(spark, dir), "l_orderkey",
          Tables.orders(spark, dir), "o_orderkey"),
        Expectations.FkCheck("lineitem.l_partkey->part",
          Tables.lineitem(spark, dir), "l_partkey",
          Tables.part(spark, dir), "p_partkey"),
        Expectations.FkCheck("lineitem.l_suppkey->supplier",
          Tables.lineitem(spark, dir), "l_suppkey",
          Tables.supplier(spark, dir), "s_suppkey"),
        Expectations.FkCheck("events.user_id->customer",
          Tables.events(spark, dir), "user_id",
          Tables.customer(spark, dir), "c_custkey"))),
    Some("""
      WITH audit AS (
        SELECT 'orders.o_custkey->customer' AS fk,
               count(*) AS n_child,
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               CAST(sum(CASE WHEN o_custkey IS NOT NULL AND c_custkey IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        UNION ALL
        SELECT 'lineitem.l_orderkey->orders', count(*),
               CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN l_orderkey IS NOT NULL AND o_orderkey IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders)
          ON l_orderkey = o_orderkey
        UNION ALL
        SELECT 'lineitem.l_partkey->part', count(*),
               CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN l_partkey IS NOT NULL AND p_partkey IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem LEFT JOIN (SELECT DISTINCT p_partkey FROM part)
          ON l_partkey = p_partkey
        UNION ALL
        SELECT 'lineitem.l_suppkey->supplier', count(*),
               CAST(sum(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN l_suppkey IS NOT NULL AND s_suppkey IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier)
          ON l_suppkey = s_suppkey
        UNION ALL
        SELECT 'events.user_id->customer', count(*),
               CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN user_id IS NOT NULL AND c_custkey IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT)
        FROM events LEFT JOIN (SELECT DISTINCT c_custkey FROM customer)
          ON user_id = c_custkey)
      SELECT fk, n_child, n_null, n_orphans,
             CAST(n_orphans AS DOUBLE) / greatest(n_child - n_null, 1)
               AS orphan_frac,
             n_orphans = 0 AS pass
      FROM audit ORDER BY fk
    """.trim))

  /** Per-user inter-arrival profile ([[TimeFeatures.interArrival]]) —
    * integer microsecond gaps end-to-end, mean as one exact
    * decimal-sum ÷ count division.
    */
  val q164InterArrival = HarnessQuery(
    "q164_interarrival",
    (spark, dir) =>
      TimeFeatures.interArrival(
        Tables.events(spark, dir), "user_id", "ts", "event_id")
        .orderBy(col("user_id")),
    Some("""
      WITH g AS (
        SELECT user_id,
               epoch_us(CAST(ts AS TIMESTAMP))
                 - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events)
      SELECT user_id,
             count(*) AS n_events,
             CAST(count(gap) AS BIGINT) AS n_gaps,
             CAST(sum(CAST(gap AS DECIMAL(25,0))) AS DOUBLE) / count(gap)
               AS mean_gap_us,
             min(gap) AS min_gap_us,
             max(gap) AS max_gap_us
      FROM g GROUP BY user_id ORDER BY user_id
    """.trim))

  /** Burst hours ([[Velocity.burstHours]], factor 2): hour buckets
    * where a user's count exceeds 2× their mean active-hour rate —
    * decided with exact integer cross-multiplication on both engines.
    */
  val q165BurstHours = HarnessQuery(
    "q165_burst_hours",
    (spark, dir) =>
      Velocity.burstHours(
        Tables.events(spark, dir), "user_id", "ts", factor = 2)
        .orderBy(col("user_id"), col("hour_start_us")),
    Some("""
      WITH per_hour AS (
        SELECT user_id,
               (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000
                 AS hour_start_us,
               count(*) AS n
        FROM events GROUP BY 1, 2),
      per_key AS (
        SELECT user_id, CAST(sum(n) AS BIGINT) AS n_total,
               CAST(count(*) AS BIGINT) AS n_hours
        FROM per_hour GROUP BY 1)
      SELECT p.user_id, p.hour_start_us, p.n, k.n_total, k.n_hours
      FROM per_hour p JOIN per_key k USING (user_id)
      WHERE p.n * k.n_hours > 2 * k.n_total
      ORDER BY p.user_id, p.hour_start_us
    """.trim))

  /** Deterministic CDC delta over customer, shared by q166/q167:
    * updates (+100 balance) for custkey % 5 == 0, deletes for
    * % 7 == 3 (minus the update set — one op per key), inserts as
    * key + 1 000 000 clones for % 11 == 0.
    */
  private def customerDelta(snap: org.apache.spark.sql.DataFrame) = {
    val updates = snap.filter(pmod(col("c_custkey"), lit(5L)) === 0)
      .withColumn("c_acctbal", col("c_acctbal") + lit(100.0))
      .withColumn("op", lit("U"))
    val deletes = snap.filter(pmod(col("c_custkey"), lit(7L)) === 3
        && pmod(col("c_custkey"), lit(5L)) =!= 0)
      .withColumn("op", lit("D"))
    val inserts = snap.filter(pmod(col("c_custkey"), lit(11L)) === 0)
      .withColumn("c_custkey", col("c_custkey") + lit(1000000L))
      .withColumn("op", lit("I"))
    updates.unionByName(deletes).unionByName(inserts)
  }

  private val deltaSql = """
      delta AS (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal,
               c_mktsegment, 'U' AS op
        FROM customer WHERE c_custkey % 5 = 0
        UNION ALL
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, 'D'
        FROM customer WHERE c_custkey % 7 = 3 AND c_custkey % 5 <> 0
        UNION ALL
        SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal,
               c_mktsegment, 'I'
        FROM customer WHERE c_custkey % 11 = 0)"""

  /** CDC merge ([[Merge.upsert]]): apply the deterministic delta to the
    * customer snapshot; the full merged table is the output, so every
    * insert/update/delete decision is hash-pinned row by row.
    */
  val q166CdcMerge = HarnessQuery(
    "q166_cdc_merge",
    (spark, dir) => {
      val snap = Tables.customer(spark, dir)
      Merge.upsert(snap, customerDelta(snap), "c_custkey", "op")
        .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some(s"""
      WITH $deltaSql
      SELECT c_custkey, c_acctbal, c_mktsegment FROM (
        SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        WHERE c_custkey NOT IN (SELECT c_custkey FROM delta)
        UNION ALL
        SELECT c_custkey, c_acctbal, c_mktsegment FROM delta WHERE op <> 'D')
      ORDER BY c_custkey
    """.trim))

  /** Merge audit ([[Merge.audit]]): the insert/update/delete/result
    * counts for the same delta, as the one-row summary a refresh job
    * logs.
    */
  val q167CdcAudit = HarnessQuery(
    "q167_cdc_audit",
    (spark, dir) => {
      val snap = Tables.customer(spark, dir)
      Merge.audit(snap, customerDelta(snap), "c_custkey", "op")
    },
    Some(s"""
      WITH $deltaSql
      SELECT (SELECT count(*) FROM customer) AS n_snapshot,
             count(*) AS n_delta,
             CAST(sum(CASE WHEN d.op <> 'D' AND s.c_custkey IS NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
             CAST(sum(CASE WHEN d.op <> 'D' AND s.c_custkey IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
             CAST(sum(CASE WHEN d.op = 'D' AND s.c_custkey IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
             (SELECT count(*) FROM customer)
               + CAST(sum(CASE WHEN d.op <> 'D' AND s.c_custkey IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT)
               - CAST(sum(CASE WHEN d.op = 'D' AND s.c_custkey IS NOT NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_result
      FROM delta d LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) s
        ON d.c_custkey = s.c_custkey
    """.trim))

  /** Per-class k-anonymity / l-diversity audit
    * ([[Privacy.kAnonymityAudit]]) over the customer quasi-identifiers
    * (nation, market segment) with account balance as the sensitive
    * attribute.
    */
  val q186KAnonymity = HarnessQuery(
    "q186_k_anonymity",
    (spark, dir) =>
      Privacy.kAnonymityAudit(
        Tables.customer(spark, dir),
        Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 10, l = 5)
        .orderBy(col("c_nationkey"), col("c_mktsegment")),
    Some("""
      SELECT c_nationkey, c_mktsegment,
             count(*) AS class_size,
             count(DISTINCT c_acctbal) AS l_diversity,
             count(*) < 10 AS k_violation,
             count(DISTINCT c_acctbal) < 5 AS l_violation
      FROM customer
      GROUP BY 1, 2 ORDER BY 1, 2
    """.trim))

  /** One-row release-gate summary ([[Privacy.kAnonymitySummary]]):
    * total classes/rows, at-risk row mass, worst class, low-diversity
    * class count.
    */
  val q187KAnonSummary = HarnessQuery(
    "q187_k_anon_summary",
    (spark, dir) =>
      Privacy.kAnonymitySummary(
        Tables.customer(spark, dir),
        Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 10, l = 5),
    Some("""
      WITH audit AS (
        SELECT count(*) AS class_size,
               count(DISTINCT c_acctbal) AS l_diversity
        FROM customer GROUP BY c_nationkey, c_mktsegment)
      SELECT count(*) AS n_classes,
             CAST(sum(class_size) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN class_size < 10 THEN class_size
               ELSE 0 END) AS BIGINT) AS rows_at_risk,
             min(class_size) AS min_class_size,
             CAST(sum(CASE WHEN l_diversity < 5 THEN 1 ELSE 0 END)
               AS BIGINT) AS classes_low_diversity
      FROM audit
    """.trim))

  /** Row-level quarantine report ([[Expectations.quarantineReport]]):
    * per-rule reject counts + the clean-row count, one scan.
    */
  val q206Quarantine = HarnessQuery(
    "q206_quarantine",
    (spark, dir) =>
      Expectations.quarantineReport(
        Tables.events(spark, dir),
        Seq(
          "value_in_range" -> (col("value") >= 0 && col("value") <= 100),
          "known_type" -> col("event_type").isin("view", "click",
            "purchase", "signup"),
          "user_in_fleet" -> (col("user_id") < 120))),
    Some("""
      WITH one AS (
        SELECT
          sum(CASE WHEN NOT coalesce("value" >= 0 AND "value" <= 100,
            FALSE) THEN 1 ELSE 0 END) AS f_range,
          sum(CASE WHEN NOT coalesce(event_type IN
            ('view', 'click', 'purchase', 'signup'), FALSE)
            THEN 1 ELSE 0 END) AS f_type,
          sum(CASE WHEN NOT coalesce(user_id < 120, FALSE)
            THEN 1 ELSE 0 END) AS f_user,
          sum(CASE WHEN coalesce("value" >= 0 AND "value" <= 100, FALSE)
            AND coalesce(event_type IN
              ('view', 'click', 'purchase', 'signup'), FALSE)
            AND coalesce(user_id < 120, FALSE)
            THEN 1 ELSE 0 END) AS clean
        FROM events)
      SELECT rule, CAST(n_rows AS BIGINT) AS n_rows FROM (
        SELECT 'value_in_range' AS rule, f_range AS n_rows FROM one
        UNION ALL SELECT 'known_type', f_type FROM one
        UNION ALL SELECT 'user_in_fleet', f_user FROM one
        UNION ALL SELECT '__clean__', clean FROM one)
      ORDER BY rule
    """.trim))

  /** CDC delta extraction ([[Merge.extractDelta]]): diff two customer
    * snapshots into an I/U/D feed; the oracle derives the expected ops
    * from the mutation rules directly.
    */
  val q207CdcExtract = HarnessQuery(
    "q207_cdc_extract",
    (spark, dir) => {
      val old = Tables.customer(spark, dir)
      val kept = old.where(col("c_custkey") % 97 =!= 0)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 31 === 0, col("c_acctbal") + 10.0d)
            .otherwise(col("c_acctbal")))
      val inserted = old.where(col("c_custkey") < 50)
        .withColumn("c_custkey", col("c_custkey") + 1000000L)
      Merge.extractDelta(old, kept.unionByName(inserted), "c_custkey",
        Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, op FROM (
        SELECT c_custkey, 'D' AS op FROM customer WHERE c_custkey % 97 = 0
        UNION ALL
        SELECT c_custkey, 'U' FROM customer
        WHERE c_custkey % 31 = 0 AND c_custkey % 97 <> 0
        UNION ALL
        SELECT c_custkey + 1000000, 'I' FROM customer WHERE c_custkey < 50)
      ORDER BY c_custkey
    """.trim))

  def all: Seq[HarnessQuery] = Seq(
    q163FkAudit, q164InterArrival, q165BurstHours, q166CdcMerge, q167CdcAudit,
    q186KAnonymity, q187KAnonSummary, q206Quarantine, q207CdcExtract)
}

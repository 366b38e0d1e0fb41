package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.queries.Registry
import graft.sources.Tables

/** Physical-plan audits over the REAL harness queries — the properties
  * the 100 TB story rests on, pinned as tests so a refactor that
  * silently de-optimizes a plan (drops a pushdown, upgrades a broadcast
  * to a shuffle, sneaks in a cartesian product) fails here rather than
  * in production:
  *
  *  - filters and column pruning must reach the parquet scan,
  *  - known dimension joins must broadcast,
  *  - NO query's optimized plan may contain a non-broadcast cartesian
  *    product (broadcast one-row/summary crossJoins are the sanctioned
  *    pattern and compile to BroadcastNestedLoopJoin).
  *
  * These assertions run against sf0.001 (plans don't change shape with
  * sf; AQE runtime re-plans are exercised by RuntimePlan/bench).
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData: Boolean = Files.isDirectory(Paths.get(sfDir))

  test("parquet scan: filter pushdown + column pruning reach the reader") {
    assume(haveData, s"$sfDir not present")
    val df = Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") > 30.0)
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["),
      s"no pushed filters in scan:\n$plan")
    assert(plan.contains("GreaterThan(l_quantity"),
      s"l_quantity filter not pushed:\n$plan")
    // pruned read schema: only the two referenced columns reach the scan
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan reads more than the projected columns:\n$plan")
  }

  test("star join: dimension side broadcasts (no shuffle for nation/region)") {
    assume(haveData, s"$sfDir not present")
    val plan = Registry.queries("q03_star_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"q03 star join lost its broadcast:\n$plan")
  }

  test("no harness query compiles to a non-broadcast cartesian product") {
    assume(haveData, s"$sfDir not present")
    // CartesianProduct = the O(n·m) shuffle-everything operator; every
    // sanctioned crossJoin in the repo broadcasts a one-row/summary
    // side and therefore compiles to BroadcastNestedLoopJoin instead.
    // Streaming-runtime rows (TWS) and config-dependent pipelines are
    // exercised elsewhere; optimizedPlan here stays cheap (no
    // execution) so the full surface can be swept.
    val offenders = Registry.all.flatMap { q =>
      val planStr =
        try q.run(spark, sfDir).queryExecution.optimizedPlan.toString
        catch { case _: Throwable => "" } // runtime-env queries skip
      SessionHygiene.reset(spark)
      if (planStr.contains("Join Cross") &&
          !planStr.contains("JOIN_SIDE_BROADCAST")) {
        // optimized-plan cross joins are fine when the physical side
        // broadcasts; re-check at the physical level
        val phys =
          try q.run(spark, sfDir).queryExecution.sparkPlan.toString
          catch { case _: Throwable => "" }
        SessionHygiene.reset(spark)
        if (phys.contains("CartesianProduct")) Some(q.name) else None
      } else None
    }
    assert(offenders.isEmpty,
      s"queries with non-broadcast cartesian products: $offenders")
  }

  test("TPC-H-shaped joins: filtered dims broadcast, no cartesian") {
    assume(haveData, s"$sfDir not present")
    Seq("q203_tpch_q3", "q204_tpch_q5", "q205_tpch_q10").foreach { name =>
      val plan = Registry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      SessionHygiene.reset(spark)
      assert(plan.contains("BroadcastHashJoin"),
        s"$name lost its dimension broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$name contains a cartesian product:\n$plan")
    }
  }

  test("round-7 training ops: model-side joins broadcast, data shuffles " +
    "stay keyed") {
    assume(haveData, s"$sfDir not present")
    // naive Bayes: the class/prior/vocab table (<= |classes| rows) must
    // broadcast; the only non-broadcast join key is the term
    val nb = Registry.queries("q264_naive_bayes")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(nb.contains("BroadcastHashJoin") ||
      nb.contains("BroadcastNestedLoopJoin"),
      s"q264 lost its class-table broadcast:\n$nb")
    // nearest centroid: centroids and norms broadcast — the corpus side
    // must never shuffle for the scoring join
    val nc = Registry.queries("q274_nearest_centroid")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(nc.contains("BroadcastHashJoin"),
      s"q274 lost its centroid broadcast:\n$nc")
    // rendezvous: pure expression routing — no join at all in the plan
    val rv = Registry.queries("q282_rendezvous")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!rv.contains("SortMergeJoin") && !rv.contains("ShuffledHashJoin"),
      s"q282 acquired a shuffle join; routing must stay expression-only:\n$rv")
    SessionHygiene.reset(spark)
  }

  test("huber/neyman: parameter tables broadcast back to the data") {
    assume(haveData, s"$sfDir not present")
    val hb = Registry.queries("q276_huber")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // ols params, centers, scale — all O(|groups|) — must broadcast
    assert(hb.contains("BroadcastHashJoin"),
      s"q276 lost its parameter-table broadcast:\n$hb")
    assert(!hb.contains("CartesianProduct"),
      s"q276 contains a cartesian product:\n$hb")
    val ny = Registry.queries("q272_neyman")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(ny.contains("BroadcastHashJoin"),
      s"q272 lost its allocation-table broadcast:\n$ny")
    SessionHygiene.reset(spark)
  }

  test("graft_jaro_winkler stays inside whole-stage codegen") {
    assume(haveData, s"$sfDir not present")
    val df = Tables.part(spark, sfDir)
      .select(graft.functions.JaroWinklerExpr.jaroWinkler(spark,
        col("p_name"), col("p_type")).as("jw"))
      .filter(col("jw") >= 0.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"),
      s"jaro-winkler projection fell out of codegen:\n$plan")
    assert(plan.contains("graft_jaro_winkler"),
      s"jaro-winkler expression missing from plan:\n$plan")
  }

  test("graft_morton stays inside whole-stage codegen") {
    assume(haveData, s"$sfDir not present")
    val df = Tables.lineitem(spark, sfDir)
      .select(graft.functions.MortonExpr.morton(spark,
        col("l_partkey"), col("l_suppkey")).as("z"))
      .filter(col("z") > 0)
    // the "*(n)" stage marker is executedPlan.toString's rendering of a
    // WholeStageCodegen span; the morton project/filter must sit in one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"),
      s"morton projection fell out of codegen:\n$plan")
    assert(plan.contains("graft_morton"),
      s"morton expression missing from plan:\n$plan")
  }
}

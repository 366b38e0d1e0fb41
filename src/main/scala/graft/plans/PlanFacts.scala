package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Physical-plan introspection: count the facts that decide a plan's
  * 100 TB behavior — shuffles, broadcasts, scans, sort-merge vs hash
  * joins, codegen spans — as a typed summary rather than a string
  * grep. The programmatic face of the PlanAuditSpec assertions: CI
  * gates, notebooks, and regression dashboards can diff PlanFacts
  * across versions to catch a de-optimization (a broadcast silently
  * upgraded to a shuffle) before it ships.
  */
object PlanFacts {

  final case class Facts(
      shuffles: Int,
      broadcasts: Int,
      scans: Int,
      sortMergeJoins: Int,
      hashJoins: Int,
      codegenSpans: Int,
      hasCartesian: Boolean)

  /** Walk the executed plan (inside AQE wrappers) and tally node
    * kinds. Node-class matching, not toString grep — renames in plan
    * text formatting can't silently break the counts.
    */
  def audit(df: DataFrame): Facts = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
      // AQE stage boundaries have no `children`; the materialized
      // subtree hangs off `plan`
      case s: QueryStageExec => p +: walk(s.plan)
      case _ => p +: p.children.flatMap(walk)
    }
    val nodes = walk(df.queryExecution.executedPlan)
    def n(pred: SparkPlan => Boolean): Int = nodes.count(pred)
    Facts(
      shuffles = n(_.isInstanceOf[ShuffleExchangeLike]),
      broadcasts = n(_.isInstanceOf[BroadcastExchangeLike]),
      scans = n(_.getClass.getSimpleName.contains("FileSourceScan")),
      sortMergeJoins = n(_.getClass.getSimpleName.startsWith("SortMergeJoin")),
      hashJoins = n(p =>
        p.getClass.getSimpleName.startsWith("BroadcastHashJoin")
          || p.getClass.getSimpleName.startsWith("ShuffledHashJoin")),
      codegenSpans = n(_.getClass.getSimpleName.startsWith("WholeStageCodegen")),
      hasCartesian = nodes.exists(
        _.getClass.getSimpleName.startsWith("CartesianProduct")))
  }
}

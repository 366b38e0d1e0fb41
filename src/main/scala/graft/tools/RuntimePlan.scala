package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the post-execution adaptive plan of a harness query — the
  * only way to see what AQE actually did (runtime exchange reuse,
  * skew-join splits, coalesced partitions don't appear in static
  * explain). Usage: runMain graft.tools.RuntimePlan <sfDir> <query>
  */
object RuntimePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = graft.HarnessSession.fromEnv(default = "32")
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    // noop write (not count()) so the printed queryExecution is the one
    // that actually ran — count() builds its own execution, and a
    // collect() would ship a detail query's full result to the driver
    // just to throw it away
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    println("==== RUNTIME PLAN " + name + " ====")
    println(plan)
    println("==== reused exchanges: " +
      plan.linesIterator.count(_.contains("ReusedExchange")))
    spark.stop()
  }
}

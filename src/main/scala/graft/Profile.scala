package graft

import org.apache.spark.sql.SparkSession

/** Warm/cold profiler: runs selected harness queries N times in one JVM
  * and prints per-iteration wall times, separating one-time codegen/JIT
  * cost from steady-state execution cost.
  * Usage: runMain graft.Profile <sfDir> <reps> [queryName...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val only = args.drop(2).toSet
    val spark = HarnessSession.fromEnv(default = "32")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          SessionHygiene.reset(spark)
          dt
        }
        println(f"PROFILE $name%-24s ${times.map(t => f"$t%.2f").mkString(" ")}")
      }
    spark.stop()
  }
}

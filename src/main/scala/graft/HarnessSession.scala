package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession builder for every harness main (Bench / Verify /
  * Explain / Profile / RuntimePlan) so config knobs can't drift between
  * the benchmarked workload and the verified one (UTC only reached
  * Bench in round 2 because the block was copy-pasted five times).
  */
object HarnessSession {
  def build(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def fromEnv(default: String = "4"): SparkSession =
    build(sys.env.getOrElse("SPARK_GRAFT_CPUS", default))
}

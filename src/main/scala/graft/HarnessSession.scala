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
      // AQE coalescing honors the advisory partition size instead of
      // maximizing parallelism (guide §2.2: fewer, larger reduce
      // partitions; the Spark docs recommend exactly this on busy
      // clusters). At 100 TB this is what keeps post-shuffle partitions
      // in the 100 MB-1 GB band; on the local bench it stops tiny
      // shuffles from being split into per-core fragments (measured:
      // q334 10.6 -> 9.0 s warm). Env-overridable so the driver's
      // scaling runs stay comparable at any core count.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def fromEnv(default: String = "4"): SparkSession =
    build(sys.env.getOrElse("SPARK_GRAFT_CPUS", default))
}

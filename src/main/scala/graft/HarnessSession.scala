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
      // AQE coalescing stays at the stock parallelism-first default:
      // round 13 measured the advisory-size-first alternative
      // (parallelismFirst=false) at parity on shuffle-light queries
      // once the per-row kernels were fixed, while collapsing the
      // CPU-heavy-but-byte-light HyperANF register fan-out to ONE task
      // (q383 8.3 -> 20 s). Partition sizing by bytes alone mis-sizes
      // stages whose cost is row fan-out, so the default floor of one
      // partition per core is the right call on this workload at any
      // scale.
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def fromEnv(default: String = "4"): SparkSession =
    build(sys.env.getOrElse("SPARK_GRAFT_CPUS", default))
}

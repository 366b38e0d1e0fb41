package graft.tools

/** Config-sensitivity probe: run one harness query warm under a few
  * runtime-settable config variants (AQE on/off, shuffle partitions) to
  * separate stage-sequencing overhead from compute. Throwaway.
  * Usage: runMain graft.tools.Scratch2 <sfDir> <query>
  */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = graft.HarnessSession.fromEnv(default = "32")
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)

    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.SessionHygiene.reset(spark)
      System.gc()
      dt
    }

    def variant(label: String, confs: Map[String, String]): Unit = {
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val ts = (1 to 3).map(_ => run())
      saved.foreach { case (k, vo) =>
        vo match { case Some(v) => spark.conf.set(k, v); case None => spark.conf.unset(k) } }
      println(f"VARIANT $label%-38s cold=${ts.head}%6.2f warm=${ts.tail.map(t => f"$t%.2f").mkString(",")}")
    }

    variant("baseline (pf=false from session)", Map.empty)
    variant("parallelismFirst true", Map(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "true"))
    variant("pf=false minPartitionNum=8", Map(
      "spark.sql.adaptive.coalescePartitions.minPartitionNum" -> "8"))
    variant("pf=false minPartitionNum=32", Map(
      "spark.sql.adaptive.coalescePartitions.minPartitionNum" -> "32"))
    variant("pf=false minPartitionSize=64k", Map(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "64k"))
    spark.stop()
  }
}

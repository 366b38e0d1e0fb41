package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-stage attribution for one harness query (guide §1/§7: find where
  * the wall-clock goes before changing anything). Runs the query once
  * cold + once warm through the noop sink with a listener attached and
  * prints, for the WARM run, every stage's wall duration, summed task
  * time, task count and shuffle read/write bytes, sorted by duration —
  * plus the job count (each Materialize.cut is its own job, so job
  * count exposes barrier overhead directly).
  *
  * Usage: runMain graft.tools.StageTimes <sfDir> <query>[,<query>...] [reps]
  */
object StageTimes {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.HarnessSession.fromEnv(default = "32")
    spark.sparkContext.setLogLevel("ERROR")

    case class St(name: String, wallMs: Long, taskMs: Long, nTasks: Int,
      shRead: Long, shWrite: Long)
    val stages = mutable.ArrayBuffer[St]()
    var jobs = 0
    var record = false
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (record) jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) {
          val i = sc.stageInfo
          val wall = (for {s <- i.submissionTime; c <- i.completionTime}
            yield c - s).getOrElse(0L)
          stages += St(i.name.takeWhile(_ != '\n'), wall,
            i.taskMetrics.executorRunTime, i.numTasks,
            i.taskMetrics.shuffleReadMetrics.totalBytesRead,
            i.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.SessionHygiene.reset(spark)
        dt
      }
      val cold = once() // warm-up: codegen/JIT, not recorded
      var warms = List.empty[Double]
      for (_ <- 1 to reps) {
        stages.clear(); jobs = 0
        record = true
        warms = once() :: warms
        record = false
      }
      // stages/jobs hold the LAST warm rep
      println(f"QUERY $name cold=$cold%.2f warm=${warms.reverse.map(w => f"$w%.2f").mkString(",")}")
      println(s"JOBS(last warm rep): $jobs  STAGES: ${stages.length}")
      val byDur = stages.sortBy(-_.wallMs)
      println(f"${"wallMs"}%7s ${"taskMs"}%7s ${"tasks"}%5s ${"shRdKB"}%8s ${"shWrKB"}%8s  stage")
      byDur.take(30).foreach { s =>
        println(f"${s.wallMs}%7d ${s.taskMs}%7d ${s.nTasks}%5d ${s.shRead / 1024}%8d ${s.shWrite / 1024}%8d  ${s.name.take(80)}")
      }
      val totWall = stages.map(_.wallMs).sum
      val totTask = stages.map(_.taskMs).sum
      println(f"TOTAL $name stage wallMs=$totWall taskMs=$totTask (warm last=${warms.head}%.2f s)")
      System.gc()
    }
    spark.stop()
  }
}

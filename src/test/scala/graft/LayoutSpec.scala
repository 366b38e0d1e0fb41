package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{Layout, Tables}

/** Write-side layout: partition directories exist and prune; clustered
  * files carry non-overlapping ranges; data round-trips exactly.
  */
class LayoutSpec extends SparkSpec {

  test("writePartitioned: hive dirs, pruned scan, exact round-trip") {
    val dir = Files.createTempDirectory("graft_layout").toString + "/events"
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    Layout.writePartitioned(ev, dir, "event_type", "ts")
    val back = spark.read.parquet(dir)
    assert(back.count() === ev.count())
    // partition directories present
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("event_type=")).sorted
    assert(dirs.nonEmpty)
    // partition filter reaches the scan as a PartitionFilter
    val plan = back.where(col("event_type") === "click")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition filter not pushed:\n$plan")
  }

  test("writeClustered: per-file value ranges do not overlap") {
    val dir = Files.createTempDirectory("graft_layout").toString + "/ev2"
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    Layout.writeClustered(ev, dir, "user_id", numFiles = 4)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length >= 2)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("user_id")), max(col("user_id"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo,
        s"overlapping file ranges: $hi > $lo")
      case _ =>
    }
  }
}

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

  test("ORC round-trip: schema and rows survive the format exactly") {
    // format-completeness check for the built-in columnar alternative:
    // a user pointing the engine at ORC inputs/outputs loses nothing
    val dir = Files.createTempDirectory("graft_orc").toString + "/events"
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema === ev.schema)
    assert(back.count() === ev.count())
    assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty)
    // predicate pushdown reaches the ORC scan
    val plan = back.where(col("user_id") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)"),
      s"filter not pushed to ORC scan:\n$plan")
  }

  test("writeZOrdered: every z-column gets bounded per-file ranges") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (1 to 20000).map(_ =>
      (rnd.nextInt(100000).toLong, rnd.nextInt(100000).toLong))
      .toDF("x", "y")
    def meanSpread(path: String, c: String): Double = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).cast("double").as("spread"))
        .select(avg($"spread")).head.getDouble(0)
      perFile / 100000.0
    }
    val zDir = Files.createTempDirectory("graft_z").toString + "/z"
    Layout.writeZOrdered(df, zDir, Seq("x", "y"), numFiles = 16)
    val cDir = Files.createTempDirectory("graft_z").toString + "/c"
    Layout.writeClustered(df, cDir, "x", numFiles = 16)
    // single-column clustering: x prunes perfectly, y not at all
    assert(meanSpread(cDir, "x") < 0.15)
    assert(meanSpread(cDir, "y") > 0.8)
    // z-order: BOTH dims bounded well below the global range — 16 files
    // tile the curve into regions no wider than ~half the space per dim
    assert(meanSpread(zDir, "x") < 0.6, s"x spread ${meanSpread(zDir, "x")}")
    assert(meanSpread(zDir, "y") < 0.6, s"y spread ${meanSpread(zDir, "y")}")
    // round-trip intact
    val back = spark.read.parquet(zDir)
    assert(back.count() === 20000 &&
      back.columns.toSeq.sorted === Seq("x", "y"))
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

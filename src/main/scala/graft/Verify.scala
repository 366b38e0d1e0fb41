package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Crash-hardened by design: `oracle_sql.json` is pure registry metadata
  * (no Spark execution needed), so it is written BEFORE the query loop,
  * and each completed query appends one line to `verify_manifest.jsonl`
  * (name, rc, rows, ms) as its parquet lands. A mid-run kill/OOM on the
  * driver's side therefore still leaves a valid oracle file plus a
  * per-query manifest for everything that completed, instead of zeroing
  * the whole round's correctness signal.
  */
object Verify {

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Registry metadata only — independent of any query execution. */
  def writeOracleJson(outDir: String): Unit = {
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }

  /** Dump each selected query to outDir/<name>/ and append a manifest
    * line per query. Returns the number of failed queries.
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          only: Option[Set[String]]): Int = {
    new java.io.File(outDir).mkdirs()
    writeOracleJson(outDir)
    val manifest = Paths.get(s"$outDir/verify_manifest.jsonl")
    Files.deleteIfExists(manifest)
    def logLine(name: String, rc: Int, rows: Long, ms: Long): Unit =
      Files.writeString(manifest,
        s"""{"name":${q(name)},"rc":$rc,"rows":$rows,"ms":$ms}\n""",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    var failed = 0
    selected.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val path = s"$outDir/$name"
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(path)
        // metadata-only count over the single file just written
        val rows = spark.read.parquet(path).count()
        logLine(name, 0, rows, (System.nanoTime() - t0) / 1000000L)
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        logLine(name, 1, -1L, (System.nanoTime() - t0) / 1000000L)
      }
      SessionHygiene.reset(spark)
    }
    failed
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = HarnessSession.fromEnv()
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    run(spark, sfDir, outDir, only)
    spark.stop()
  }
}

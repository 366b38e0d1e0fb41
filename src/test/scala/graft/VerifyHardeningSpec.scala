package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Pins the crash-hardening contract of Verify (round-7 driver failure:
  * CORRECTNESS_r07.json arrived empty because oracle_sql.json was only
  * written after all 318 dumps):
  *  - oracle_sql.json must exist even when ZERO queries execute — it is
  *    registry metadata, written before the query loop;
  *  - each completed query appends a verify_manifest.jsonl line as its
  *    parquet lands, so a mid-run kill still leaves a per-query record.
  */
class VerifyHardeningSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"verify-hardening-$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("oracle_sql.json is written before any query executes") {
    val out = tmpDir("no-queries")
    // a selector that matches nothing: the query loop runs zero queries,
    // yet the oracle file must be complete
    val failed = Verify.run(spark, sf, out, Some(Set("no_such_query")))
    assert(failed == 0)
    val oracle = Files.readString(Paths.get(s"$out/oracle_sql.json"))
    assert(oracle.startsWith("{") && oracle.endsWith("}"))
    assert(oracle.contains("\"q01_pricing_summary\""), "full registry present")
    assert(oracle.contains("\"q02_range_join\""))
    // no parquet dirs were produced
    assert(!Files.list(Paths.get(out)).iterator().asScala
      .exists(p => Files.isDirectory(p)))
  }

  test("manifest gains one line per completed query dump") {
    val out = tmpDir("two-queries")
    val failed = Verify.run(spark, sf, out,
      Some(Set("q01_pricing_summary", "q02_range_join")))
    assert(failed == 0)
    val oraclePath = Paths.get(s"$out/oracle_sql.json")
    assert(Files.exists(oraclePath))
    val lines = Files.readAllLines(Paths.get(s"$out/verify_manifest.jsonl"))
      .asScala.toList
    assert(lines.size == 2)
    val names = lines.map { l =>
      assert(l.contains("\"rc\":0"))
      assert(!l.contains("\"rows\":-1"))
      l.split("\"name\":\"")(1).split("\"")(0)
    }
    assert(names.toSet == Set("q01_pricing_summary", "q02_range_join"))
    // both dumps landed as parquet dirs
    assert(Files.isDirectory(Paths.get(s"$out/q01_pricing_summary")))
    assert(Files.isDirectory(Paths.get(s"$out/q02_range_join")))
    // the oracle file was not touched after the first dump began: its
    // mtime precedes (or equals) every parquet dir's
    val oracleM = Files.getLastModifiedTime(oraclePath).toMillis
    names.foreach { n =>
      assert(oracleM <= Files.getLastModifiedTime(Paths.get(s"$out/$n")).toMillis)
    }
  }
}

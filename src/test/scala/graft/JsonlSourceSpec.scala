package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.JsonlSource

class JsonlSourceSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType)))

  test("jsonl round-trip is exact, one object per line") {
    val dir = Files.createTempDirectory("graft_jsonl").toString + "/docs"
    val df = Seq(
      (1L, "hello \"quoted\" world", "web"),
      (2L, "unicode: café ☃", "books"),
      (3L, null.asInstanceOf[String], "web")).toDF("doc_id", "text", "source")
    JsonlSource.write(df, dir)
    val back = JsonlSource.read(spark, dir, schema)
    assert(back.exceptAll(df).count() === 0 && df.exceptAll(back).count() === 0)
    // the on-disk format really is one JSON object per line
    val lines = Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(_.endsWith(".json"))
      .flatMap(p => scala.io.Source.fromFile(p, "UTF-8").getLines().toSeq)
    assert(lines.length === 3)
    assert(lines.forall(l => l.startsWith("{") && l.endsWith("}")))
  }

  test("quarantine read splits corrupt lines from valid ones in one scan") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    val f = java.nio.file.Paths.get(dir, "part-0.json")
    Files.writeString(f,
      """{"doc_id": 1, "text": "ok", "source": "web"}
        |not json at all
        |{"doc_id": 2, "text": "fine", "source": "web"}
        |""".stripMargin)
    // cache before splitting: Spark refuses corrupt-column-only queries
    // straight off raw files (readQuarantine's documented contract)
    val back = JsonlSource.readQuarantine(spark, dir, schema).cache()
    try {
      val good = back.filter(col("_corrupt_record").isNull)
      val bad = back.filter(col("_corrupt_record").isNotNull)
      assert(good.count() === 2 && bad.count() === 1)
      assert(bad.select("_corrupt_record").head.getString(0) === "not json at all")
    } finally back.unpersist()
    // strict mode refuses the same file
    intercept[org.apache.spark.SparkException] {
      JsonlSource.read(spark, dir, schema).count()
    }
  }
}

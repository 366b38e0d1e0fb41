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

  test("orc round-trip preserves values and (name, dataType) pairs") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/t"
    val df = Seq(
      (1L, "a", 1.25, java.sql.Timestamp.valueOf("2024-03-01 10:20:30.123456"),
        Array(1.0f, -2.5f)),
      (2L, null, -0.0, null, Array.empty[Float]),
      (3L, "c", Double.MaxValue, java.sql.Timestamp.valueOf("1999-12-31 23:59:59"),
        null))
      .toDF("id", "s", "d", "ts", "vec")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // ORC (like parquet) widens nullability on read, including array
    // element containsNull — compare the nullability-free rendering
    assert(back.schema.map(f => (f.name, f.dataType.catalogString)) ===
      df.schema.map(f => (f.name, f.dataType.catalogString)))
    val a = df.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val b = back.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    a.zip(b).foreach { case (x, y) =>
      // arrays arrive as Spark collections — normalize before compare
      def norm(s: Seq[Any]) = s.map {
        case w: scala.collection.Seq[_] => w.toList
        case w => w
      }
      assert(norm(x) === norm(y))
    }
  }
}

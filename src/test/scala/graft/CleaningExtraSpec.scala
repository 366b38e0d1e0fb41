package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cleaning, TextDedup}

class CleaningExtraSpec extends SparkSpec {
  import spark.implicits._

  test("findTargetColumn sniffs class then Class then none (processor.py:25-28)") {
    assert(Cleaning.findTargetColumn(Seq((1, 0)).toDF("x", "class")) === Some("class"))
    assert(Cleaning.findTargetColumn(Seq((1, 0)).toDF("x", "Class")) === Some("Class"))
    assert(Cleaning.findTargetColumn(Seq((1, 0)).toDF("x", "y")) === None)
  }

  test("dropBoilerplateShingles removes shingles above the doc-frequency cap") {
    // "common words here" appears in every doc; unique tails differ
    val docs = (1 to 10).map(i => (i.toLong, s"common words here unique$i tail$i end$i"))
      .toDF("id", "text")
    val sets = TextDedup.shingleSets(docs, "text", "id", n = 3)
    val cleaned = TextDedup.dropBoilerplateShingles(sets, "id", maxDocFrac = 0.5)
    val remaining = cleaned.select(explode($"shingles").as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!remaining.contains("common words here"))
    assert(remaining.values.forall(_ <= 5))
    assert(remaining.nonEmpty)
  }

  test("nullAudit counts per-column nulls in one pass") {
    val df = Seq((Some(1), Some("a")), (None, Some("b")), (None, None))
      .toDF("x", "y")
    val r = Cleaning.nullAudit(df, Seq("x", "y")).head
    assert(r.getLong(0) === 2L && r.getLong(1) === 1L && r.getLong(2) === 3L)
  }
}

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

  test("imputeMean fills nulls with the exact column mean, leaves the rest") {
    val df = Seq(
      (1L, Some(2.0), Some(10.0)),
      (2L, None, Some(20.0)),
      (3L, Some(4.0), None),
      (4L, None, None)).toDF("id", "a", "b")
    val got = Cleaning.imputeMean(df, Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L) === ((2.0, 10.0))) // non-null untouched
    assert(got(2L)._1 === 3.0 && got(2L)._2 === 20.0) // mean(2,4)
    assert(got(3L)._2 === 15.0) // mean(10,20)
    assert(got(4L) === ((3.0, 15.0)))
    // a column with no non-null values stays null (no mean exists)
    val allNull = Seq((1L, Option.empty[Double])).toDF("id", "x")
    assert(Cleaning.imputeMean(allNull, Seq("x")).collect().head.isNullAt(1))
  }

  test("imputeMedian fills nulls with the exact interpolated median") {
    val df = Seq(
      (1L, Some(1.0)), (2L, Some(2.0)), (3L, Some(10.0)), (4L, Some(100.0)),
      (5L, None)).toDF("id", "x")
    val got = Cleaning.imputeMedian(df, Seq("x"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(5L) === 6.0) // median of (1,2,10,100) = (2+10)/2
    assert(got(1L) === 1.0 && got(4L) === 100.0)
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

  test("jsonKeyProfile: presence counts; null/non-object rows stay " +
    "in the denominator only") {
    import spark.implicits._
    val df = Seq(
      Some("""{"a": 1, "b": "x"}"""),
      Some("""{"a": 2}"""),
      Some("""{"c": {"nested": true}}"""),
      Some("[1,2,3]"), // non-object: no top-level keys
      None)
      .toDF("j")
    val got = Cleaning.jsonKeyProfile(df, "j")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(got("a") === ((2L, 0.4)))
    assert(got("b") === ((1L, 0.2)))
    assert(got("c") === ((1L, 0.2))) // nested object = one key
    assert(got.size === 3)
  }
}

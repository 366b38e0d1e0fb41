package graft

import graft.operators.Eda

class EdaSpec extends SparkSpec {
  import spark.implicits._

  test("describe matches hand-computed stats incl. interpolated quartiles") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val r = Eda.describe(df, Seq("x")).head
    assert(r.getAs[Long]("n_count") === 4L)
    assert(r.getAs[Double]("mean") === 2.5)
    assert(math.abs(r.getAs[Double]("std") - math.sqrt(5.0 / 3)) < 1e-12)
    assert(r.getAs[Double]("p25") === 1.75)
    assert(r.getAs[Double]("p50") === 2.5)
    assert(r.getAs[Double]("p75") === 3.25)
  }

  test("describeApprox agrees with exact describe on small data") {
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val exact = Eda.describe(df, Seq("x")).head
    val approx = Eda.describeApprox(df, Seq("x")).head
    assert(approx.getAs[Double]("mean") === exact.getAs[Double]("mean"))
    assert(math.abs(approx.getAs[Double]("p50") - exact.getAs[Double]("p50")) <= 1.0)
  }

  test("histogram degenerates to one bucket on a constant column (no ANSI error)") {
    val df = Seq((5.0, "a"), (5.0, "b"), (5.0, "a")).toDF("x", "cls")
    val rows = Eda.histogram(df, "x", "cls", bins = 10).collect()
    assert(rows.forall(_.getLong(0) === 0L))
    assert(rows.map(_.getLong(2)).sum === 3L)
  }

  test("histogram: max value lands in the last bucket, not out of range") {
    val df = Seq((0.0, "a"), (10.0, "a")).toDF("x", "cls")
    val buckets = Eda.histogram(df, "x", "cls", bins = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(buckets === Map(0L -> 1L, 4L -> 1L))
  }

  test("profile: one row per column with nulls, distincts, numeric min/max") {
    val df = Seq(
      (Some(1L), Some("a"), Some(2.5)),
      (Some(2L), None, Some(-1.0)),
      (Some(2L), Some("b"), None)
    ).toDF("id", "s", "v")
    val rows = Eda.profile(df, Seq("id", "s", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("id", "s", "v"))
    val id = rows("id")
    assert(id.getLong(1) === 3L && id.getLong(2) === 0L && id.getLong(3) === 2L)
    assert(id.getDouble(4) === 1.0 && id.getDouble(5) === 2.0)
    val s = rows("s")
    assert(s.getLong(2) === 1L && s.getLong(3) === 2L)
    assert(s.isNullAt(4) && s.isNullAt(5)) // non-numeric: no min/max
    val v = rows("v")
    assert(v.getLong(2) === 1L && v.getLong(3) === 2L)
    assert(v.getDouble(4) === -1.0 && v.getDouble(5) === 2.5)
  }

  test("profile approx mode keeps the same shape with HLL distincts") {
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("a", "b")
    val rows = Eda.profile(df, Seq("a", "b"), exact = false).collect()
    assert(rows.length === 2)
    // HLL estimate is within its published 5% band on this cardinality
    val a = rows.find(_.getString(0) == "a").get
    assert(math.abs(a.getLong(3) - 100L) <= 10L)
  }
}

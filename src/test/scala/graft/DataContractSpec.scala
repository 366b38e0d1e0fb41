package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Data-contract smoke checks against the REAL driver testdata at
  * sf0.001 — schema, time-unit and value-range assertions per
  * FIXTURES.md §B.
  *
  * Round 6 proved the unit suite can stay green while the harness
  * breaks: every operator spec uses literal DataFrames, so when the
  * testdata's `ts` flipped parquet TIMESTAMP(NANOS) → TIMESTAMP(MICROS)
  * the loader silently divided micros by 1000 and collapsed a month of
  * events into ~42 minutes of 1970 — 17 red harness rows under 216
  * green specs. These tests read the actual parquet through
  * [[Tables.load]] and pin the SEMANTIC contract (values, not just
  * types), so a vintage flip fails loudly here first.
  */
class DataContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData: Boolean = Files.isDirectory(Paths.get(sfDir))

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("events: ts decodes into the documented 2024-01 month, not 1970") {
    assume(haveData, s"$sfDir not present")
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType)
    val r = ev.agg(
      min(col("ts")).as("lo"), max(col("ts")).as("hi"),
      count(lit(1)).as("n")).head()
    val (lo, hi, n) = (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))
    assert(n == 1000L, s"expected 1000 events at sf0.001, got $n")
    // the killer assertion: a micros-as-nanos decode lands in 1970 and
    // a nanos-as-micros decode lands in year ~55973 — both far outside
    assert(!lo.before(ts("2024-01-01 00:00:00")), s"min ts drifted: $lo")
    assert(!hi.after(ts("2024-12-31 23:59:59")), s"max ts drifted: $hi")
    // unit errors also destroy the SPAN (÷1000 → ~42 min; ×1000 → ~80 y)
    val spanDays = (hi.getTime - lo.getTime) / 86400000.0
    assert(spanDays > 20 && spanDays < 40,
      s"events span $spanDays days — expected ~30 (unit mismatch?)")
  }

  test("events: id uniqueness and value range hold") {
    assume(haveData, s"$sfDir not present")
    val ev = Tables.events(spark, sfDir)
    val r = ev.agg(
      count(lit(1)).as("n"),
      countDistinct(col("event_id")).as("ids"),
      min(col("value")).as("vlo"),
      sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("nullUsers")).head()
    assert(r.getLong(0) == r.getLong(1), "event_id is not unique")
    assert(r.getDouble(2) >= 0.0, s"negative event value: ${r.getDouble(2)}")
    assert(r.getLong(3) == 0L, "null user_id present")
  }

  test("star schema + documents + embeddings: row counts match FIXTURES.md") {
    assume(haveData, s"$sfDir not present")
    val expected = Map(
      "region" -> 5L, "nation" -> 25L, "customer" -> 150L,
      "supplier" -> 10L, "part" -> 200L, "orders" -> 1500L,
      "lineitem" -> 6000L, "documents" -> 500L, "embeddings" -> 500L)
    expected.foreach { case (name, want) =>
      val got = Tables.load(spark, sfDir, name).count()
      assert(got == want, s"$name: expected $want rows at sf0.001, got $got")
    }
  }

  test("orders/lineitem: date columns land in a plausible decade") {
    assume(haveData, s"$sfDir not present")
    val o = Tables.orders(spark, sfDir)
      .agg(min(col("o_orderdate")), max(col("o_orderdate"))).head()
    val l = Tables.lineitem(spark, sfDir)
      .agg(min(col("l_shipdate")), max(col("l_shipdate"))).head()
    Seq(o.getTimestamp(0), o.getTimestamp(1),
        l.getTimestamp(0), l.getTimestamp(1)).foreach { t =>
      assert(!t.before(ts("1990-01-01 00:00:00")) &&
             !t.after(ts("2100-01-01 00:00:00")),
        s"date column decoded outside plausible range: $t (unit mismatch?)")
    }
  }

  test("embeddings: vectors are non-empty float arrays with labels") {
    assume(haveData, s"$sfDir not present")
    val e = Tables.embeddings(spark, sfDir)
    assert(e.schema("embedding").dataType == ArrayType(FloatType))
    val r = e.agg(
      min(size(col("embedding"))).as("dlo"),
      max(size(col("embedding"))).as("dhi"),
      countDistinct(col("label")).as("classes")).head()
    assert(r.getInt(0) == r.getInt(1) && r.getInt(0) > 0,
      s"ragged or empty embedding dims: ${r.getInt(0)}..${r.getInt(1)}")
    assert(r.getLong(2) >= 2, "embeddings.label has fewer than 2 classes")
  }

  test("documents: text column is non-degenerate") {
    assume(haveData, s"$sfDir not present")
    val d = Tables.documents(spark, sfDir)
    val r = d.agg(
      sum(when(col("text").isNull || length(col("text")) === 0, 1L)
        .otherwise(0L)).as("empty"),
      countDistinct(col("lang")).as("langs")).head()
    assert(r.getLong(0) == 0L, s"${r.getLong(0)} empty documents")
    assert(r.getLong(1) >= 1L)
  }
}

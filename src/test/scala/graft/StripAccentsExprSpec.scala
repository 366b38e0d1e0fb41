package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.StripAccentsExpr

class StripAccentsExprSpec extends SparkSpec {
  import spark.implicits._

  test("accents fold, non-decomposable chars pass through (DuckDB strip_accents parity)") {
    // expected strings confirmed against DuckDB strip_accents: NFD +
    // mark removal, no recomposition, ligatures/ø/CJK untouched
    val cases = Seq(
      ("café", "cafe"),
      ("café", "cafe"),          // already-decomposed input
      ("naïve", "naive"),
      ("Äé ü ñ ç", "Ae u n c"),
      ("ø ﬁ", "ø ﬁ"), // no canonical decomposition
      ("北京", "北京"),   // CJK untouched
      ("plain ascii", "plain ascii"),
      ("", ""))
    val got = cases.map(_._1).toDF("s")
      .select(StripAccentsExpr.stripAccents(spark, $"s")).collect()
      .map(_.getString(0))
    assert(got.toSeq === cases.map(_._2))
  }

  test("null propagates; ASCII fast path returns the same UTF8String; idempotent") {
    val withNull = Seq(Some("é"), None).toDF("s")
      .select(StripAccentsExpr.stripAccents(spark, $"s").as("n")).collect()
    assert(withNull(0).getString(0) === "e")
    assert(withNull(1).isNullAt(0))
    val ascii = UTF8String.fromString("already fine")
    assert(StripAccentsExpr.strip(ascii) eq ascii) // no copy
    val once = StripAccentsExpr.strip(UTF8String.fromString("café"))
    assert(StripAccentsExpr.strip(once) === once)
  }

  test("accent variants join as one key after stripping") {
    // the motivating use: "résumé" vs "resume" must collide for
    // search/dedup keys in accent-insensitive pipelines
    val df = Seq((1L, "résumé"), (2L, "resume"))
      .toDF("id", "text")
    val raw = df.select(md5($"text").as("fp")).distinct().count()
    val folded = df
      .select(md5(StripAccentsExpr.stripAccents(spark, $"text")).as("fp"))
      .distinct().count()
    assert(raw === 2L && folded === 1L)
  }
}

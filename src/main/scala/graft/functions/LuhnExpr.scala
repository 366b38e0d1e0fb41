package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Luhn-validated payment-card redaction — the checksum-aware PII
  * scrub. Pattern-only card regexes false-positive on order ids, phone
  * numbers and timestamps; a real scrubber validates the Luhn check
  * digit (ISO/IEC 7812) before destroying data. Semantics, chosen to be
  * exactly replayable in external SQL (no lookarounds, no overlapping
  * matches):
  *
  *   - candidates are MAXIMAL contiguous digit runs of length 13-19
  *     (PAN lengths); runs outside that length are never touched, and a
  *     20+-digit run is NOT re-segmented (it is one non-candidate run);
  *   - a candidate replaces with `[CARD]` iff its Luhn checksum is 0;
  *   - everything else passes through byte-for-byte.
  *
  * Codegen'd `UnaryExpression`s ([[LuhnMaskExpr]] -> masked string,
  * [[LuhnCardCountExpr]] -> count of validated runs) over one shared
  * single-pass scanner — no regex engine, no allocation on digit-free
  * text (the overwhelming case at corpus scale), and a Scala UDF here
  * would box every row and break whole-stage codegen. Registered as SQL
  * `graft_luhn_mask` / `graft_luhn_count` by [[GraftExtensions]].
  */
case class LuhnMaskExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    LuhnExpr.mask(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LuhnExpr.mask($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_luhn_mask"
}

case class LuhnCardCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    LuhnExpr.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LuhnExpr.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_luhn_count"
}

object LuhnExpr {

  private val Mask = "[CARD]"

  /** Luhn checksum over chars [from, until) of `s` (all digits). */
  private def luhnOk(s: String, from: Int, until: Int): Boolean = {
    var sum = 0
    var i = until - 1
    var double = false
    while (i >= from) {
      var d = s.charAt(i) - '0'
      if (double) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      double = !double
      i -= 1
    }
    sum % 10 == 0
  }

  /** Shared scan: invokes `onRun(start, end)` for every maximal digit
    * run with a Luhn-valid PAN length, returns whether any digit exists
    * at all (the allocation fast path for mask).
    */
  private def scan(str: String)(onRun: (Int, Int) => Unit): Boolean = {
    val n = str.length
    var i = 0
    var sawDigit = false
    while (i < n) {
      val c = str.charAt(i)
      if (c >= '0' && c <= '9') {
        sawDigit = true
        var j = i + 1
        while (j < n && { val d = str.charAt(j); d >= '0' && d <= '9' }) j += 1
        val len = j - i
        if (len >= 13 && len <= 19 && luhnOk(str, i, j)) onRun(i, j)
        i = j
      } else i += 1
    }
    sawDigit
  }

  /** Called from generated code — must stay public. */
  def mask(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder
    var last = 0
    var hit = false
    val sawDigit = scan(str) { (from, until) =>
      hit = true
      sb.append(str, last, from).append(Mask)
      last = until
    }
    if (!sawDigit || !hit) return s
    sb.append(str, last, str.length)
    UTF8String.fromString(sb.toString)
  }

  /** Called from generated code — must stay public. */
  def count(s: UTF8String): Long = {
    var n = 0L
    scan(s.toString)((_, _) => n += 1)
    n
  }

  /** Column forms via the session registry — same route as
    * [[StripAccentsExpr.stripAccents]].
    */
  def luhnMask(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_luhn_mask", exprs => LuhnMaskExpr(exprs.head), "scala_udf")
    org.apache.spark.sql.functions.call_function("graft_luhn_mask", c)
  }

  def luhnCount(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_luhn_count", exprs => LuhnCardCountExpr(exprs.head), "scala_udf")
    org.apache.spark.sql.functions.call_function("graft_luhn_count", c)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer et al. 2003) over a token
  * array, entirely IN-ROW — the round-13 replacement for the exploded
  * shape in [[graft.operators.TextDedup.winnowFingerprints]], which
  * built each k-gram through three interpreted lambdas (slice +
  * array_join + md5/conv), exploded every gram, and paid an id-keyed
  * exchange + per-doc sort for the rolling-window minimum.
  *
  * Value-identical selection: gram i (1-based, clamped at 16383 grams)
  * is packed as
  *
  *   v_i = first48bits(md5(array_join(slice(toks, i, k), " "))) * 16384
  *         + (16383 - i)
  *
  * (the `conv(substring(md5(s), 1, 12), 16, 10)` hash — first 6 digest
  * bytes big-endian), the window minimum runs over each start
  * p in 1..max(m-w+1, 1) with the frame truncated at the document end,
  * and the DISTINCT selected values surface as (pos = i, fp = hash)
  * structs — exactly the old explode/window/filter/distinct pipeline,
  * with zero shuffles behind it.
  *
  * Null token array / fewer than k tokens -> empty array (the old
  * `when(m >= 1, ...).otherwise(empty)` + explode-of-empty). Null
  * token elements are skipped by the join like `array_join`.
  */
case class WinnowExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val toks = first.eval(input)
    val k = second.eval(input)
    val w = third.eval(input)
    WinnowExpr.build(toks.asInstanceOf[ArrayData],
      if (k == null) 1 else k.asInstanceOf[Int],
      if (w == null) 1 else w.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = first.genCode(ctx)
    val kk = second.genCode(ctx)
    val ww = third.genCode(ctx)
    val resultCode =
      code"""
        ${t.code}
        ${kk.code}
        ${ww.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.WinnowExpr.build(
            ${t.isNull} ? null : ${t.value},
            ${kk.isNull} ? 1 : ${kk.value},
            ${ww.isNull} ? 1 : ${ww.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "graft_winnow"
}

object WinnowExpr {
  private val Space = UTF8String.fromString(" ")
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Tight loop; called from generated code — stays public. */
  def build(toks: ArrayData, k: Int, w: Int): ArrayData = {
    if (toks == null) return Empty
    val n = toks.numElements()
    val m = math.min(n - (k - 1), 16383)
    if (m < 1) return Empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val packed = new Array[Long](m)
    val window = new Array[UTF8String](k)
    var i = 0
    while (i < m) {
      var j = 0
      var c = 0
      while (j < k) {
        if (!toks.isNullAt(i + j)) { // array_join skips nulls
          window(c) = toks.getUTF8String(i + j)
          c += 1
        }
        j += 1
      }
      val s =
        if (c == k) UTF8String.concatWs(Space, window: _*)
        else UTF8String.concatWs(Space,
          java.util.Arrays.copyOfRange(window, 0, c): _*)
      val d = md.digest(s.getBytes)
      val h = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      packed(i) = h * 16384L + (16383L - (i + 1))
      i += 1
    }
    val starts = math.max(m - (w - 1), 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var p = 0
    while (p < starts) {
      var mn = Long.MaxValue
      var j = p
      val end = math.min(p + w, m)
      while (j < end) {
        if (packed(j) < mn) mn = packed(j)
        j += 1
      }
      seen.add(mn)
      p += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var q = 0
    while (it.hasNext) {
      val v = it.next().longValue()
      out(q) = InternalRow(16383L - (v & 16383L), v >> 14)
      q += 1
    }
    new GenericArrayData(out)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles from a TOKEN ARRAY, as one codegen'd
  * loop — the per-row builder behind [[graft.functions.TextFunctions
  * .shingles]] and therefore the whole minhash/winnowing/containment
  * shingle family.
  *
  * Value-identical to the higher-order form it replaces:
  *
  * {{{
  *   array_distinct(
  *     when(size(toks) - (n-1) > 0,
  *       transform(sequence(1, size(toks) - (n-1)),
  *         i => array_join(slice(toks, i, n), " ")))
  *       .otherwise(array().cast("array<string>")))
  * }}}
  *
  * — same " "-joined n-grams, same first-occurrence-order distinct,
  * same empty-array result for docs shorter than n tokens or a null
  * token array (`when(null > 0, ...)` takes the otherwise branch).
  * Null ELEMENTS inside the token array cannot occur from `split` but
  * are joined as empty strings like `array_join`'s null-skip... they
  * are skipped entirely (array_join drops nulls); replicated.
  *
  * The lambda form walked the expression interpreter per shingle and
  * allocated a slice array + joined string through three interpreted
  * lambdas; this is one loop with the same UTF8String concatenations
  * only.
  */
case class ShinglesExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_shingles expects (array<string>, int), got " +
            s"(${left.dataType}, ${right.dataType})")
    }
  }

  // the whole expression never returns null (null tokens -> empty set),
  // so eval must bypass BinaryExpression's null short-circuit
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val toks = left.eval(input)
    val n = right.eval(input)
    ShinglesExpr.build(toks.asInstanceOf[ArrayData],
      if (n == null) 1 else n.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val resultCode =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.ShinglesExpr.build(
            ${leftGen.isNull} ? null : ${leftGen.value},
            ${rightGen.isNull} ? 1 : ${rightGen.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_shingles"
}

object ShinglesExpr {
  private val Space = UTF8String.fromString(" ")
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Tight loop; called from generated code — stays public. */
  def build(toks: ArrayData, n: Int): ArrayData = {
    if (toks == null) return Empty
    val count = toks.numElements() - (n - 1)
    if (count <= 0) return Empty
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < count) {
      var j = 0
      var k = 0
      while (j < n) {
        // array_join skips null elements (cannot occur from split, but
        // replicate the contract)
        if (!toks.isNullAt(i + j)) {
          window(k) = toks.getUTF8String(i + j)
          k += 1
        }
        j += 1
      }
      val s =
        if (k == n) UTF8String.concatWs(Space, window: _*)
        else UTF8String.concatWs(Space,
          java.util.Arrays.copyOfRange(window, 0, k): _*)
      seen.add(s)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    new GenericArrayData(out)
  }
}

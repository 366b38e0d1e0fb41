package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd integer dot product over two `array<bigint>`
  * columns — the inner loop of the quantized ANN first pass
  * ([[graft.operators.Similarity.quantizedTopK]]). One fused while-loop
  * per row inside whole-stage codegen, against the alternatives'
  * per-row costs: a higher-order `aggregate(zip_with(...))` allocates
  * an intermediate array and evaluates two lambda trees per element,
  * and the explode-join-aggregate shape shuffles |pairs|·dim rows. The
  * integer domain keeps every engine bit-identical — no accumulation-
  * order or decimal-vs-double parity concerns.
  *
  * Semantics: null array → null result; ragged arrays dot over the
  * shared prefix (the per-dimension equi-join shape keeps only common
  * indices — same contract); null elements contribute 0 (a dropped
  * dimension, as posexplode + sum-ignoring-nulls behaves).
  *
  * Registered as SQL function `graft_quantized_dot` by
  * [[graft.plans.GraftExtensions]].
  */
case class QuantizedDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    QuantizedDotExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.QuantizedDotExpr.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_quantized_dot"
}

object QuantizedDotExpr {
  /** Tight loop over the unsafe array data; called from generated code —
    * must stay public and static-shaped.
    */
  def dot(x: ArrayData, y: ArrayData): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }
}

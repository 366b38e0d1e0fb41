package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the 2-D Morton (Z-order) code:
  * interleaves the low 32 bits of `x` and `y` — x on the even bit
  * positions, y on the odd — into one 64-bit key. Sorting or
  * range-partitioning a table by this key co-locates rows that are
  * close in BOTH dimensions, the standard multi-dimensional clustering
  * trick for scan pruning (a query filtering either dimension touches
  * O(√N) of the z-ordered file ranges instead of all of them) — the
  * data-layout story a 100 TB table needs, computed here as a
  * codegen'd expression so layout writes stay inside whole-stage
  * codegen.
  *
  * Inputs are taken modulo 2³² (callers clamp/bucket first; layout
  * keys are bucket ordinals, not raw values). The magic-number spread
  * is the textbook O(log w) bit-twiddle, identical in interpreted and
  * generated paths.
  */
case class MortonExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(x: Any, y: Any): Any =
    MortonExpr.interleave(
      x.asInstanceOf[Number].longValue(),
      y.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.MortonExpr.interleave((long)$x, (long)$y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_morton"
}

object MortonExpr {

  /** Column-API entry: `morton(spark, xCol, yCol)` (temp-function
    * registration, same pattern as [[LuhnExpr.luhnCount]]).
    */
  def morton(spark: SparkSession, x: Column, y: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_morton", exprs => MortonExpr(exprs.head, exprs(1)), "scala_udf")
    org.apache.spark.sql.functions.call_function("graft_morton", x, y)
  }

  /** Spread the low 32 bits of v to the even bit positions of a long:
    * bit i of v lands at bit 2i. Five mask-and-shift rounds (w=32).
    * Public: called from generated code.
    */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** z = spread(x) | spread(y) << 1. Public: called from generated code. */
  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)
}

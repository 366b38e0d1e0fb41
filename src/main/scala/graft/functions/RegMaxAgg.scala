package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise max over fixed-width HLL register arrays — the merge
  * step of the PACKED HyperANF round ([[graft.operators.Graphs]]):
  * registers travel as one array<int> per vertex (slot = bucket,
  * 0 = empty) instead of one row per (vertex, bucket), so the
  * edge-join fan-out carries |edges| rows, not |edges|·M — the
  * round-13 rewrite that took the q383/q390 round stages from ~16M
  * joined rows to ~260k.
  *
  * Union semantics identical to the old `groupBy(id, bucket).max(m)`:
  * rank 0 marks an absent register (true ranks are >= 1), and max
  * over (absent = 0) equals max over present rows. Null arrays
  * contribute nothing; ragged arrays max over their length.
  */
case class RegMaxAgg(
    child: Expression,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](width)

  override def update(b: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v == null) return b
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), width)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val m = arr.getInt(i)
        if (m > b(i)) b(i) = m
      }
      i += 1
    }
    b
  }

  override def merge(b: Array[Int], o: Array[Int]): Array[Int] = {
    var i = 0
    while (i < width) {
      if (o(i) > b(i)) b(i) = o(i)
      i += 1
    }
    b
  }

  override def eval(b: Array[Int]): Any =
    new GenericArrayData(b.map(Int.box(_): Any))

  override def serialize(b: Array[Int]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 * width)
    var i = 0
    while (i < width) { buf.putInt(b(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new Array[Int](bytes.length / 4)
    var i = 0
    while (i < b.length) { b(i) = buf.getInt; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): RegMaxAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): RegMaxAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def prettyName: String = "graft_reg_max"
}

/** (used_registers, harmonic __sum) from a packed register array in one
  * loop: used = count of non-zero slots, sum = Σ 2^(54 − m) over them —
  * identical to the old per-row `count(*)` +
  * `sum(shiftleft(1L, 54 - __m))` over the (id, bucket, m) table.
  */
case class RegStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("used", IntegerType, nullable = false),
    StructField("sum", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    RegStatsExpr.stats(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RegStatsExpr.stats($a);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "graft_reg_stats"
}

object RegStatsExpr {
  def stats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var used = 0
    var sum = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val m = arr.getInt(i)
        if (m > 0) {
          used += 1
          sum += 1L << (54 - m)
        }
      }
      i += 1
    }
    InternalRow(used, sum)
  }
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact-decimal Gram / per-dimension-sum aggregates as single-pass
  * typed aggregates — the round-13 replacement for
  * [[graft.operators.LinAlg]]'s explode-the-upper-triangle shape,
  * which materialized d(d+1)/2 interpreted `named_struct`s with a
  * BigDecimal `Cast` per element per row (the whole-family hotspot:
  * ~4 s single-task at sf0.1 for d = 64) and pushed n·d(d+1)/2 rows
  * through a 2080-group HashAggregate.
  *
  * Value semantics are IDENTICAL to the exploded shape:
  *
  *   - each product x_i·x_j is computed in double and quantized through
  *     the `Cast(double -> DECIMAL(30,18))` path
  *     ([[ExactDotExpr.quant18]]: shortest-decimal HALF_UP at scale 18,
  *     BigDecimal fallback above the scaled-long range), then summed
  *     EXACTLY in a signed 128-bit accumulator per (i, j) pair;
  *   - a null element x_i nulls every product it touches, and SQL `sum`
  *     skips null terms — replicated by per-pair "seen" bits: a pair
  *     whose every term was null surfaces as a null sum;
  *   - rows with a null vector exploded nothing; if NO row had a
  *     vector, the old groupBy produced zero groups — replicated by
  *     returning a null array (explode of null = zero rows);
  *   - vectors shorter than `dim` contributed null products beyond
  *     their length (transform indexed past the end), longer vectors
  *     only their first `dim` dims — replicated by bounding the loop
  *     at min(length, dim) and leaving the rest unseen.
  *
  * [[GramAgg]] evaluates to array<struct<i int, j int, dot double>>
  * (upper triangle, (i, j) ascending); [[DimSumsAgg]] to
  * array<struct<i int, sx decimal(38,18), n bigint>> — `inline` either
  * to recover the old row shape.
  */
abstract class ExactVecAgg extends TypedImperativeAggregate[VecAggBuf] {

  def child: Expression
  def dim: Int

  @transient protected lazy val elemCode: Int = child.dataType match {
    case ArrayType(FloatType, _)   => ExactDotExpr.ElemFloat
    case ArrayType(DoubleType, _)  => ExactDotExpr.ElemDouble
    case ArrayType(LongType, _)    => ExactDotExpr.ElemLong
    case ArrayType(IntegerType, _) => ExactDotExpr.ElemInt
    case t => throw new IllegalArgumentException(
      s"$prettyName expects a numeric array, got $t")
  }

  /** number of accumulator slots */
  protected def slots: Int

  override def createAggregationBuffer(): VecAggBuf = new VecAggBuf(slots)

  override def merge(b: VecAggBuf, o: VecAggBuf): VecAggBuf = { b.merge(o); b }

  override def serialize(b: VecAggBuf): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): VecAggBuf =
    VecAggBuf.fromBytes(bytes)

  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
}

/** Signed-128-bit exact accumulators (scale-18 unscaled values) plus
  * per-slot seen flags and a row count. One BigDecimal materialization
  * per slot at eval time, none per row.
  */
final class VecAggBuf(val n: Int) {
  val hi = new Array[Long](n)
  val lo = new Array[Long](n)
  val seen = new Array[Boolean](n)
  // rare escape hatch: products outside the scaled-long range keep
  // exactness through a BigDecimal side accumulator per slot
  var big: Array[java.math.BigDecimal] = _
  var rows: Long = 0L

  def add(slot: Int, p: Double): Unit = {
    try {
      val u = ExactDotExpr.quant18(p)
      val s = lo(slot) + u
      val carry = ((lo(slot) & u) | ((lo(slot) | u) & ~s)) >>> 63
      hi(slot) += (u >> 63) + carry
      lo(slot) = s
    } catch {
      case _: ArithmeticException =>
        // same Cast semantics: DECIMAL(30,18) overflow -> null term
        // (sum skips it); representable-but-large values accumulate
        // exactly in BigDecimal space
        val d = org.apache.spark.sql.types.Decimal(p)
        if (!d.changePrecision(30, 18)) return // null term: not seen
        if (big == null) big = new Array[java.math.BigDecimal](n)
        big(slot) =
          (if (big(slot) == null) java.math.BigDecimal.ZERO else big(slot))
            .add(d.toJavaBigDecimal)
    }
    seen(slot) = true
  }

  def value(slot: Int): java.math.BigDecimal = {
    val base = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(hi(slot)).shiftLeft(64)
        .add(new java.math.BigInteger(
          java.lang.Long.toUnsignedString(lo(slot)))), 18)
    if (big != null && big(slot) != null) base.add(big(slot)) else base
  }

  def merge(o: VecAggBuf): Unit = {
    var i = 0
    while (i < n) {
      val u = o.lo(i)
      val s = lo(i) + u
      val carry = ((lo(i) & u) | ((lo(i) | u) & ~s)) >>> 63
      hi(i) += o.hi(i) + carry
      lo(i) = s
      seen(i) = seen(i) || o.seen(i)
      if (o.big != null && o.big(i) != null) {
        if (big == null) big = new Array[java.math.BigDecimal](n)
        big(i) = (if (big(i) == null) java.math.BigDecimal.ZERO else big(i))
          .add(o.big(i))
      }
      i += 1
    }
    rows += o.rows
  }

  def toBytes: Array[Byte] = {
    val bigBytes: Array[Array[Byte]] =
      if (big == null) null
      else big.map(b => if (b == null) null else b.toString.getBytes("UTF-8"))
    val bigLen =
      if (bigBytes == null) 0
      else bigBytes.map(b => 4 + (if (b == null) 0 else b.length)).sum
    val buf = ByteBuffer.allocate(4 + 8 + n * 17 + 1 + bigLen)
    buf.putInt(n)
    buf.putLong(rows)
    var i = 0
    while (i < n) {
      buf.putLong(hi(i)); buf.putLong(lo(i))
      buf.put(if (seen(i)) 1.toByte else 0.toByte)
      i += 1
    }
    buf.put(if (bigBytes == null) 0.toByte else 1.toByte)
    if (bigBytes != null) bigBytes.foreach { b =>
      buf.putInt(if (b == null) -1 else b.length)
      if (b != null) buf.put(b)
    }
    buf.array()
  }
}

object VecAggBuf {
  def fromBytes(bytes: Array[Byte]): VecAggBuf = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = new VecAggBuf(n)
    b.rows = buf.getLong
    var i = 0
    while (i < n) {
      b.hi(i) = buf.getLong; b.lo(i) = buf.getLong
      b.seen(i) = buf.get() == 1
      i += 1
    }
    if (buf.get() == 1) {
      b.big = new Array[java.math.BigDecimal](n)
      i = 0
      while (i < n) {
        val len = buf.getInt
        if (len >= 0) {
          val arr = new Array[Byte](len)
          buf.get(arr)
          b.big(i) = new java.math.BigDecimal(new String(arr, "UTF-8"))
        }
        i += 1
      }
    }
    b
  }
}

case class GramAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ExactVecAgg {

  override protected def slots: Int = dim * (dim + 1) / 2

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("dot", DoubleType, nullable = true))), containsNull = false)

  override def update(b: VecAggBuf, input: InternalRow): VecAggBuf = {
    val v = child.eval(input)
    // the old explode generated its (i, j) skeleton from sequence(),
    // not the vector, so even a NULL-vector row kept every group alive
    // with null terms — count it, add nothing
    b.rows += 1
    if (v == null) return b
    val arr = v.asInstanceOf[ArrayData]
    val m = math.min(arr.numElements(), dim)
    // hoist the element reads once per row
    val xs = new Array[Double](m)
    val nulls = new Array[Boolean](m)
    var i = 0
    while (i < m) {
      if (arr.isNullAt(i)) nulls(i) = true
      else xs(i) = elemCode match {
        case ExactDotExpr.ElemFloat  => arr.getFloat(i).toDouble
        case ExactDotExpr.ElemDouble => arr.getDouble(i)
        case ExactDotExpr.ElemLong   => arr.getLong(i).toDouble
        case _                       => arr.getInt(i).toDouble
      }
      i += 1
    }
    i = 0
    while (i < m) {
      if (!nulls(i)) {
        // slot base for row i of the upper triangle
        var slot = i * dim - i * (i - 1) / 2
        val xi = xs(i)
        var j = i
        while (j < m) {
          if (!nulls(j)) b.add(slot, xi * xs(j))
          slot += 1
          j += 1
        }
      }
      i += 1
    }
    b
  }

  override def eval(b: VecAggBuf): Any = {
    if (b.rows == 0L) return null
    val out = new Array[Any](slots)
    var slot = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val dot: Any =
          if (b.seen(slot)) Double.box(b.value(slot).doubleValue()) else null
        out(slot) = InternalRow(i, j, dot)
        slot += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def withNewMutableAggBufferOffset(o: Int): GramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def prettyName: String = "graft_gram_agg"
}

case class DimSumsAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ExactVecAgg {

  override protected def slots: Int = dim

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("sx", DecimalType(38, 18), nullable = true),
    StructField("n", LongType, nullable = false))), containsNull = false)

  override def update(b: VecAggBuf, input: InternalRow): VecAggBuf = {
    val v = child.eval(input)
    // null-vector rows kept groups alive in the old explode (see
    // [[GramAgg.update]]) and are counted in n
    b.rows += 1
    if (v == null) return b
    val arr = v.asInstanceOf[ArrayData]
    val m = math.min(arr.numElements(), dim)
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val x = elemCode match {
          case ExactDotExpr.ElemFloat  => arr.getFloat(i).toDouble
          case ExactDotExpr.ElemDouble => arr.getDouble(i)
          case ExactDotExpr.ElemLong   => arr.getLong(i).toDouble
          case _                       => arr.getInt(i).toDouble
        }
        b.add(i, x)
      }
      i += 1
    }
    b
  }

  override def eval(b: VecAggBuf): Any = {
    if (b.rows == 0L) return null
    val out = new Array[Any](dim)
    var i = 0
    while (i < dim) {
      val sx: Any =
        if (b.seen(i)) Decimal(b.value(i), 38, 18) else null
      out(i) = InternalRow(i, sx, b.rows)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def withNewMutableAggBufferOffset(o: Int): DimSumsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DimSumsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def prettyName: String = "graft_dim_sums_agg"
}

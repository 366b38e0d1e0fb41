package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native exact-decimal dot product over two numeric array columns —
  * the inner kernel of every cosine/distance path in
  * [[graft.operators.Similarity]] (brute top-k, LSH sign sketches,
  * semantic dedup, kNN-graph re-rank) and their consumers.
  *
  * Value semantics are IDENTICAL to the higher-order form it replaces
  *
  * {{{
  *   aggregate(
  *     zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double"))
  *       .cast("decimal(30,18)")),
  *     lit(BigDecimal.ZERO).cast("decimal(37,18)"),
  *     (acc, v) => (acc + v).cast("decimal(37,18)")).cast("double")
  * }}}
  *
  * element by element: each product is computed in double (exact for
  * float operands), quantized through the same `Cast(double ->
  * DECIMAL(30,18))` path (`Decimal(d)` = shortest-decimal
  * representation, HALF_UP at scale 18), and summed exactly — so the
  * result is bit-identical to the fold under ANY summation order, the
  * cross-engine parity discipline every oracle depends on. The ONLY
  * intentional difference is speed: one tight JVM loop per row inside
  * whole-stage codegen, versus an interpreted two-lambda tree per
  * element that allocates an intermediate array and walks the
  * expression interpreter ~4·dim times per row (measured 10-40x slower,
  * and the reason single-row-group local scans pinned one core for
  * seconds on the LSH queries).
  *
  * Null semantics (same as the fold): null array -> null; arrays of
  * different lengths -> null (zip_with pads with null, the null product
  * poisons the fold); any null ELEMENT -> null. Empty arrays -> 0.0.
  * A product whose decimal quantization overflows DECIMAL(30,18)
  * (|p| >= 10^12) -> null, like the non-ANSI Cast. Documented delta:
  * an ACCUMULATOR overflowing DECIMAL(37,18) (|sum| >= 10^19 — needs
  * ~10^19 unit-scale terms) returned null in the fold but returns the
  * exact sum here; unreachable for any real input.
  *
  * Registered as SQL function `graft_exact_dot` by
  * [[graft.plans.GraftExtensions]]; [[graft.operators.Similarity.dot]]
  * registers it as a temp function on the active session.
  */
case class ExactDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def code(e: Expression): Int = e.dataType match {
    case ArrayType(FloatType, _)   => ExactDotExpr.ElemFloat
    case ArrayType(DoubleType, _)  => ExactDotExpr.ElemDouble
    case ArrayType(LongType, _)    => ExactDotExpr.ElemLong
    case ArrayType(IntegerType, _) => ExactDotExpr.ElemInt
    case t => throw new IllegalArgumentException(
      s"graft_exact_dot expects numeric arrays, got $t")
  }
  @transient private lazy val leftCode = code(left)
  @transient private lazy val rightCode = code(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    ExactDotExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftCode, rightCode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("exactDot")
      s"""
         |java.lang.Double $tmp =
         |  graft.functions.ExactDotExpr.dot($a, $b, $leftCode, $rightCode);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_exact_dot"
}

object ExactDotExpr {
  final val ElemDouble = 0
  final val ElemFloat = 1
  final val ElemLong = 2
  final val ElemInt = 3

  private def elem(x: ArrayData, i: Int, code: Int): Double = code match {
    case ElemDouble => x.getDouble(i)
    case ElemFloat  => x.getFloat(i).toDouble
    case ElemLong   => x.getLong(i).toDouble
    case _          => x.getInt(i).toDouble
  }

  private val Pow10 = Array.iterate(1L, 19)(_ * 10L)

  /** `Cast(double -> DECIMAL(30,18), non-ANSI)` as a scaled long —
    * i.e. HALF_UP at 18 fractional digits of the SHORTEST-DECIMAL
    * representation of `p` (the `BigDecimal.valueOf` /
    * `Double.toString` semantics Spark's Cast goes through), computed
    * by parsing the `Double.toString` digits directly instead of
    * allocating two BigDecimals per element. Pinned bit-for-bit
    * against the BigDecimal path by ExactDotExprSpec's fuzz test.
    * Throws ArithmeticException on |p| >= ~9.2 * 10^0 scale overflow
    * of the long (caller falls back to the BigDecimal path) and
    * NumberFormatException on NaN/Infinity (same as the Cast).
    */
  private[functions] def quant18(p: Double): Long = {
    val s = java.lang.Double.toString(p) // [-]D.DDD[E[-]X] | NaN | Infinity
    val n = s.length
    val neg = s.charAt(0) == '-'
    var i = if (neg) 1 else 0
    var mant = 0L
    var frac = 0
    var exp = 0
    var inFrac = false
    var j = i
    var done = false
    while (j < n && !done) {
      val c = s.charAt(j)
      if (c == '.') inFrac = true
      else if (c == 'E') {
        exp = java.lang.Integer.parseInt(s, j + 1, n, 10)
        done = true
      } else if (c >= '0' && c <= '9') {
        mant = mant * 10 + (c - '0')
        if (inFrac) frac += 1
      } else {
        // NaN / Infinity: same failure the BigDecimal.valueOf path hits
        throw new NumberFormatException(s)
      }
      j += 1
    }
    val k = exp - frac + 18
    val u =
      if (k >= 0) {
        if (k > 18 || mant > Long.MaxValue / Pow10(k))
          throw new ArithmeticException("quant18 overflow")
        mant * Pow10(k)
      } else if (k <= -19) 0L
      else {
        val d = Pow10(-k)
        val q = mant / d
        val r = mant % d
        q + (if (r * 2 >= d) 1L else 0L) // HALF_UP on the magnitude
      }
    if (neg) -u else u
  }

  /** Tight loop; called from generated code — stays public. Returns
    * null for the fold's null cases, else the exact decimal sum as
    * double. Accumulates the scale-18 unscaled values in a signed
    * 128-bit (hi, lo) pair — exact for any realistic dim — and
    * converts to double once per row.
    */
  def dot(x: ArrayData, y: ArrayData, cx: Int, cy: Int): java.lang.Double = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val p = elem(x, i, cx) * elem(y, i, cy)
      val u =
        try quant18(p)
        catch {
          case _: ArithmeticException =>
            // |p| too large for the scaled-long fast path: replicate
            // the Cast exactly — null on DECIMAL(30,18) overflow
            val d = org.apache.spark.sql.types.Decimal(p)
            if (!d.changePrecision(30, 18)) return null
            return slowTail(x, y, cx, cy, i, hi, lo)
        }
      // 128-bit signed accumulate
      val s = lo + u
      val carry = ((lo & u) | ((lo | u) & ~s)) >>> 63
      hi += (u >> 63) + carry
      lo = s
      i += 1
    }
    java.lang.Double.valueOf(toDouble(hi, lo))
  }

  /** Rare-path continuation in BigDecimal space from element `i`
    * (first element whose product over/underflows the scaled-long
    * quantizer), seeded with the 128-bit partial sum.
    */
  private def slowTail(
      x: ArrayData, y: ArrayData, cx: Int, cy: Int,
      from: Int, hi: Long, lo: Long): java.lang.Double = {
    var acc = new java.math.BigDecimal(bigInt(hi, lo), 18)
    var i = from
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val p = elem(x, i, cx) * elem(y, i, cy)
      val d = org.apache.spark.sql.types.Decimal(p)
      if (!d.changePrecision(30, 18)) return null
      acc = acc.add(d.toJavaBigDecimal)
      i += 1
    }
    java.lang.Double.valueOf(acc.doubleValue())
  }

  private def bigInt(hi: Long, lo: Long): java.math.BigInteger =
    java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))

  private def toDouble(hi: Long, lo: Long): Double =
    if (hi == 0 && lo >= 0) new java.math.BigDecimal(
      java.math.BigInteger.valueOf(lo), 18).doubleValue()
    else if (hi == -1 && lo < 0) new java.math.BigDecimal(
      java.math.BigInteger.valueOf(lo), 18).doubleValue()
    else new java.math.BigDecimal(bigInt(hi, lo), 18).doubleValue()
}

/** `exact_decimal_dot(a, b) > 0` as one certified-fast expression — the
  * sign decision of the LSH sign sketch
  * ([[graft.operators.Similarity.signSketch]] /`signSketchTable`),
  * which is the ONLY consumer of those dots: the sketch never needs the
  * dot's value, just whether the exact decimal fold is positive.
  *
  * Fast path: one plain-double pass computes the approximate sum S and
  * the absolute-product sum A. The exact decimal dot differs from S by
  * at most err = A·n·2.3e-16 (conservative double-summation bound; the
  * true constant is (n-1)·2^-52) + n·1e-18 (each term is quantized
  * HALF_UP at scale 18, so each moves < 0.5e-18, doubled for safety).
  * If |S| > err the sign of the exact fold is PROVEN equal to the sign
  * of S and the expression answers without any decimal work — the
  * overwhelmingly common case, since hyperplane projections are almost
  * never within 1e-13 of zero. Otherwise (including any NaN/Infinity,
  * which fail both comparisons) it falls back to [[ExactDotExpr.dot]]
  * itself, so uncertain rows get the bit-exact decision by
  * construction — output is IDENTICAL to `ExactDotExpr > 0` on every
  * input, only faster.
  *
  * Null semantics follow `dot > lit(0)`: null dot (null array, ragged,
  * null element) -> null boolean.
  */
case class ExactDotPositiveExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.BooleanType

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  private def code(e: Expression): Int = e.dataType match {
    case ArrayType(FloatType, _)   => ExactDotExpr.ElemFloat
    case ArrayType(DoubleType, _)  => ExactDotExpr.ElemDouble
    case ArrayType(LongType, _)    => ExactDotExpr.ElemLong
    case ArrayType(IntegerType, _) => ExactDotExpr.ElemInt
    case t => throw new IllegalArgumentException(
      s"graft_exact_dot_positive expects numeric arrays, got $t")
  }
  @transient private lazy val leftCode = code(left)
  @transient private lazy val rightCode = code(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    ExactDotPositiveExpr.positive(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], leftCode, rightCode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotPos")
      s"""
         |java.lang.Boolean $tmp =
         |  graft.functions.ExactDotPositiveExpr.positive($a, $b, $leftCode, $rightCode);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.booleanValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_exact_dot_positive"
}

object ExactDotPositiveExpr {
  def positive(x: ArrayData, y: ArrayData, cx: Int, cy: Int): java.lang.Boolean = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var a = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val p = (cx match {
        case ExactDotExpr.ElemDouble => x.getDouble(i)
        case ExactDotExpr.ElemFloat  => x.getFloat(i).toDouble
        case ExactDotExpr.ElemLong   => x.getLong(i).toDouble
        case _                       => x.getInt(i).toDouble
      }) * (cy match {
        case ExactDotExpr.ElemDouble => y.getDouble(i)
        case ExactDotExpr.ElemFloat  => y.getFloat(i).toDouble
        case ExactDotExpr.ElemLong   => y.getLong(i).toDouble
        case _                       => y.getInt(i).toDouble
      })
      s += p
      a += math.abs(p)
      i += 1
    }
    val err = a * n * 2.3e-16 + n * 1e-18
    if (s > err) java.lang.Boolean.TRUE
    else if (s < -err) java.lang.Boolean.FALSE
    else {
      // uncertain (or NaN/Inf): the bit-exact decision
      val d = ExactDotExpr.dot(x, y, cx, cy)
      if (d == null) null else java.lang.Boolean.valueOf(d.doubleValue() > 0.0)
    }
  }
}

/** Exact squared-L2 distance over two numeric arrays as one codegen'd
  * loop, with the SAME per-term semantics as the exploded per-dimension
  * dataflow it replaces
  * (`sum(((x - c) * (x - c)).cast("decimal(30,18)"))` over the
  * per-dim equi-join in [[graft.operators.Clustering]]):
  *
  *   - each (x_i - c_i)^2 computed in double, quantized through the
  *     Cast(double -> DECIMAL(30,18)) path, summed exactly;
  *   - a null element on EITHER side skips that term (SQL sum ignores
  *     null terms) — unlike [[ExactDotExpr]]'s zip_with poisoning,
  *     because the join shape this replaces paired dims positionally
  *     and summed over the non-null ones;
  *   - if NO term survives (all elements null), the sum is null, like
  *     an all-null SQL sum;
  *   - arrays of different lengths pair over the shared prefix (the
  *     old equi-join's dim intersection) — callers pass equal-length
  *     slices when they need that contract surfaced.
  *
  * Returns DECIMAL(38,18) (the type of the old sum), so downstream
  * min/struct comparisons and inertia sums see identical values.
  */
case class ExactL2DistExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.DecimalType

  override def dataType: DataType = DecimalType(38, 18)
  override def nullable: Boolean = true

  private def code(e: Expression): Int = e.dataType match {
    case ArrayType(FloatType, _)   => ExactDotExpr.ElemFloat
    case ArrayType(DoubleType, _)  => ExactDotExpr.ElemDouble
    case ArrayType(LongType, _)    => ExactDotExpr.ElemLong
    case ArrayType(IntegerType, _) => ExactDotExpr.ElemInt
    case t => throw new IllegalArgumentException(
      s"graft_exact_l2 expects numeric arrays, got $t")
  }
  @transient private lazy val leftCode = code(left)
  @transient private lazy val rightCode = code(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    ExactL2DistExpr.dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftCode, rightCode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("l2")
      s"""
         |org.apache.spark.sql.types.Decimal $tmp =
         |  graft.functions.ExactL2DistExpr.dist($a, $b, $leftCode, $rightCode);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_exact_l2"
}

object ExactL2DistExpr {
  def dist(x: ArrayData, y: ArrayData, cx: Int, cy: Int)
      : org.apache.spark.sql.types.Decimal = {
    val n = math.min(x.numElements(), y.numElements())
    var hi = 0L
    var lo = 0L
    var seen = false
    var big: java.math.BigDecimal = null
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val dx = (cx match {
          case ExactDotExpr.ElemDouble => x.getDouble(i)
          case ExactDotExpr.ElemFloat  => x.getFloat(i).toDouble
          case ExactDotExpr.ElemLong   => x.getLong(i).toDouble
          case _                       => x.getInt(i).toDouble
        }) - (cy match {
          case ExactDotExpr.ElemDouble => y.getDouble(i)
          case ExactDotExpr.ElemFloat  => y.getFloat(i).toDouble
          case ExactDotExpr.ElemLong   => y.getLong(i).toDouble
          case _                       => y.getInt(i).toDouble
        })
        val p = dx * dx
        try {
          val u = ExactDotExpr.quant18(p)
          val s = lo + u
          val carry = ((lo & u) | ((lo | u) & ~s)) >>> 63
          hi += (u >> 63) + carry
          lo = s
          seen = true
        } catch {
          case _: ArithmeticException =>
            val d = org.apache.spark.sql.types.Decimal(p)
            if (d.changePrecision(30, 18)) { // overflow -> null term, skipped
              big = (if (big == null) java.math.BigDecimal.ZERO else big)
                .add(d.toJavaBigDecimal)
              seen = true
            }
        }
      }
      i += 1
    }
    if (!seen) return null
    var bd = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(hi).shiftLeft(64)
        .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo))), 18)
    if (big != null) bd = bd.add(big)
    val d = org.apache.spark.sql.types.Decimal(bd)
    if (!d.changePrecision(38, 18)) null else d
  }
}

/** Plain-double dot product twin of [[ExactDotExpr]] — the sequential
  * left-to-right fold
  *
  * {{{
  *   aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
  *     lit(0.0), (acc, v) => acc + v)
  * }}}
  *
  * as one codegen'd loop (double adds ARE order-sensitive, so the loop
  * keeps the fold's left-to-right order and is bit-identical to it).
  * Used by the prefilter paths ([[graft.operators.Similarity.dotDouble]])
  * where the final answer is still decided by the exact kernel. Null
  * semantics as [[ExactDotExpr]] (null array/ragged/null element ->
  * null; empty -> 0.0).
  */
case class PlainDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def code(e: Expression): Int = e.dataType match {
    case ArrayType(FloatType, _)   => ExactDotExpr.ElemFloat
    case ArrayType(DoubleType, _)  => ExactDotExpr.ElemDouble
    case ArrayType(LongType, _)    => ExactDotExpr.ElemLong
    case ArrayType(IntegerType, _) => ExactDotExpr.ElemInt
    case t => throw new IllegalArgumentException(
      s"graft_plain_dot expects numeric arrays, got $t")
  }
  @transient private lazy val leftCode = code(left)
  @transient private lazy val rightCode = code(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    PlainDotExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftCode, rightCode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("plainDot")
      s"""
         |java.lang.Double $tmp =
         |  graft.functions.PlainDotExpr.dot($a, $b, $leftCode, $rightCode);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_plain_dot"
}

object PlainDotExpr {
  def dot(x: ArrayData, y: ArrayData, cx: Int, cy: Int): java.lang.Double = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += (cx match {
        case ExactDotExpr.ElemDouble => x.getDouble(i)
        case ExactDotExpr.ElemFloat  => x.getFloat(i).toDouble
        case ExactDotExpr.ElemLong   => x.getLong(i).toDouble
        case _                       => x.getInt(i).toDouble
      }) * (cy match {
        case ExactDotExpr.ElemDouble => y.getDouble(i)
        case ExactDotExpr.ElemFloat  => y.getFloat(i).toDouble
        case ExactDotExpr.ElemLong   => y.getLong(i).toDouble
        case _                       => y.getInt(i).toDouble
      })
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

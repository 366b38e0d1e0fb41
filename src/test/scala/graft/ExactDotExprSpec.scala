package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Pins the round-13 codegen'd dot kernels to the higher-order folds
  * they replaced: [[graft.functions.ExactDotExpr]] must equal the
  * decimal-quantized `aggregate(zip_with(...))` fold BIT-FOR-BIT
  * (every oracle's cosine/distance value flows through it), and
  * [[graft.functions.PlainDotExpr]] the plain double fold, on random
  * data and on every null/ragged edge case the fold defines.
  */
class ExactDotExprSpec extends SparkSpec {
  import spark.implicits._

  /** The exact fold [[Similarity.dot]] lowered to before round 13. */
  private def oldExactDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double"))
        .cast("decimal(30,18)")),
      lit(java.math.BigDecimal.ZERO).cast("decimal(37,18)"),
      (acc, v) => (acc + v).cast("decimal(37,18)"))
      .cast("double")

  private def oldPlainDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("ExactDotExpr == old decimal fold, bit-for-bit, random float x float") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      (Array.fill(64)(rnd.nextFloat() * 2f - 1f),
        Array.fill(64)(rnd.nextFloat() * 2f - 1f)))
    val df = rows.toDF("a", "b")
      .select(Similarity.dot($"a", $"b").as("neu"),
        oldExactDot($"a", $"b").as("old"))
    val got = df.collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("ExactDotExpr == old fold on float x double-literal (hyperplane shape)") {
    val rnd = new scala.util.Random(11)
    val hp = Array.fill(64)(rnd.nextDouble() - 0.5)
    val rows = Seq.fill(100)(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    val df = rows.toDF("v")
      .select(Similarity.dot($"v", typedLit(hp)).as("neu"),
        oldExactDot($"v", typedLit(hp)).as("old"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("ExactDotExpr edge cases match the fold: empty, ragged, null element, null array") {
    val df = Seq(
      (Some(Seq.empty[Float]), Some(Seq.empty[Float])), // empty -> 0.0
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f))), // ragged -> null
      (Some(Seq(1.0f)), Some(Seq(1.0f, 2.0f))), // ragged other side -> null
      (None, Some(Seq(1.0f))), // null array -> null
      (Some(Seq(1.0f)), None) // null array -> null
    ).toDF("a", "b")
      .select(Similarity.dot($"a", $"b").as("neu"),
        oldExactDot($"a", $"b").as("old"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) === r.getDouble(1))
    }
    // null ELEMENT poisons the fold -> null (built via SQL to get a
    // null inside the array)
    val ne = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS a, " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS b")
      .select(Similarity.dot($"a", $"b").as("neu"),
        oldExactDot($"a", $"b").as("old"))
      .head
    assert(ne.isNullAt(0) && ne.isNullAt(1))
  }

  test("PlainDotExpr == old double fold (order-sensitive), incl. edge cases") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(200)(
      (Array.fill(64)(rnd.nextFloat() * 2f - 1f),
        Array.fill(64)(rnd.nextFloat() * 2f - 1f)))
    val df = rows.toDF("a", "b")
      .select(Similarity.dotDouble($"a", $"b").as("neu"),
        oldPlainDot($"a", $"b").as("old"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
    val edge = Seq((Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float])))
      .toDF("a", "b")
      .select(Similarity.dotDouble($"a", $"b").as("neu"),
        oldPlainDot($"a", $"b").as("old"))
      .collect()
    assert(edge(0).isNullAt(0) && edge(0).isNullAt(1))
    assert(edge(1).getDouble(0) === 0.0 && edge(1).getDouble(1) === 0.0)
  }

  test("quant18 == BigDecimal.valueOf(p).setScale(18, HALF_UP) on fuzz + structured edges") {
    val m = classOf[graft.functions.ExactDotExpr.type]
      .getDeclaredMethods.find(_.getName.endsWith("quant18")).get
    m.setAccessible(true)
    def fast(p: Double): Option[Long] =
      try m.invoke(graft.functions.ExactDotExpr, Double.box(p)) match {
        case l: java.lang.Long => Some(l.longValue())
      } catch {
        case e: java.lang.reflect.InvocationTargetException
            if e.getCause.isInstanceOf[ArithmeticException] =>
          // scaled-long overflow -> kernel falls back to BigDecimal;
          // must only ever happen outside the unit-scale regime
          assert(math.abs(p) > 0.9, s"unexpected overflow fallback at $p")
          None
      }
    def slow(p: Double): BigInt = BigInt(java.math.BigDecimal.valueOf(p)
      .setScale(18, java.math.RoundingMode.HALF_UP).unscaledValue())
    val rnd = new scala.util.Random(99)
    val structured = Seq(0.0, -0.0, 1.0, -1.0, 0.1, -0.1, 0.5e-18, 1e-18,
      -0.5e-18, 1.5e-18, 4.9e-324, -4.9e-324, 1e-19, 2.5e-18, 3.5e-18,
      0.3, 0.7, 1.0 / 3.0, math.Pi, 1e-300, 8.9, -8.9, 1.234567890123e-5,
      java.lang.Double.MIN_NORMAL, 0.010000000000000002)
    val fuzz = Seq.fill(2000000) {
      rnd.nextInt(4) match {
        case 0 => (rnd.nextFloat() * 2f - 1f).toDouble *
          (rnd.nextFloat() * 2f - 1f) // the embedding-product regime
        case 1 => (rnd.nextDouble() * 2 - 1) * math.pow(10, rnd.nextInt(40) - 30)
        case 2 => java.lang.Double.longBitsToDouble(
          (rnd.nextLong() & 0x7fcfffffffffffffL) | // finite exponents only
            (rnd.nextLong() & 0x8000000000000000L)) match {
          case d if d.isNaN || d.isInfinite || math.abs(d) >= 9.0 => 0.12345
          case d => d
        }
        case _ => rnd.nextInt(2000001).toDouble / 1e18 *
          (if (rnd.nextBoolean()) 1 else -1) // dense around the grid
      }
    }
    (structured ++ fuzz).foreach { p =>
      fast(p).foreach { u =>
        assert(BigInt(u) === slow(p), s"quant18 mismatch at p=$p (bits=${java.lang.Double.doubleToRawLongBits(p)})")
      }
    }
  }

  test("ExactDotPositiveExpr == (old fold > 0) incl. near-zero fallback rows") {
    import graft.functions.ExactDotPositiveExpr
    val rnd = new scala.util.Random(3)
    // random rows plus adversarial near-orthogonal pairs (forces the
    // exact fallback branch)
    val rows = Seq.fill(300)(
      (Array.fill(32)(rnd.nextFloat() * 2f - 1f),
        Array.fill(32)(rnd.nextFloat() * 2f - 1f))) ++
      Seq.tabulate(50) { i =>
        val a = Array.fill(32)(rnd.nextFloat())
        // b orthogonal-ish: copy a, flip half the signs -> dot near zero
        val b = a.zipWithIndex.map { case (v, j) => if (j % 2 == 0) v else -v }
        (a, b)
      } ++ Seq(
      (Array(1.0f, 1.0f), Array(1.0f, -1.0f)), // exactly zero -> false both
      (Array(0.0f), Array(0.0f)))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_exact_dot_positive_t",
      exprs => ExactDotPositiveExpr(exprs(0), exprs(1)), "scala_udf")
    val df = rows.toDF("a", "b")
      .select(call_function("graft_exact_dot_positive_t", $"a", $"b").as("neu"),
        (oldExactDot($"a", $"b") > lit(0.0)).as("old"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getBoolean(0) === r.getBoolean(1))
    }
  }

  test("signSketch (inline) still equals signSketchTable path via lshKnnGraph determinism") {
    // the sign decision is the consumer that must not flip: sketch a
    // fixed corpus through the public kNN graph twice and require
    // identical edges (exercises ExactDotExpr under zip_with lambdas)
    val rnd = new scala.util.Random(5)
    val em = Seq.tabulate(80)(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
    val g1 = Similarity.lshKnnGraph(em, "vec_id", "embedding",
      k = 3, numBits = 8, bands = 2, dim = 16)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val g2 = Similarity.lshKnnGraph(em, "vec_id", "embedding",
      k = 3, numBits = 8, bands = 2, dim = 16)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g1 === g2 && g1.nonEmpty)
  }
}

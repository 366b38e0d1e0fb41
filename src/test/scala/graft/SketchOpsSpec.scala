package graft

import org.apache.spark.sql.functions._

import graft.operators.{LinAlg, Sketches, TimeSeries}

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hllDistinct: small cardinalities hit the linear-counting branch " +
    "and land near exact; registers stay within m = 64") {
    val df = (1 to 500).map(i => ("g", (i % 20).toString)).toDF("g", "item")
    val out = Sketches.hllDistinct(df, "g", "item").collect()
    assert(out.length === 1)
    val r = out.head
    val used = r.getAs[Int]("used_registers")
    assert(used >= 1 && used <= 64)
    assert(r.getAs[Int]("zero_registers") === 64 - used)
    assert(r.getAs[Long]("exact") === 20L)
    // linear counting at 20 distinct in 64 registers: well under 50% err
    assert(math.abs(r.getAs[Double]("est") - 20.0) / 20.0 < 0.5)
  }

  test("hllDistinct: estimate is insensitive to duplication and " +
    "partitioning (pure distinct semantics)") {
    val once = (1 to 300).map(i => ("g", s"u$i")).toDF("g", "item")
    val dup = once.unionAll(once).unionAll(once).repartition(13)
    val a = Sketches.hllDistinct(once, "g", "item").collect().head
    val b = Sketches.hllDistinct(dup, "g", "item").collect().head
    assert(a.getAs[Double]("est") === b.getAs[Double]("est"))
    assert(a.getAs[Long]("exact") === b.getAs[Long]("exact"))
    // m = 64 gives ~13% standard error; 300 distinct should estimate
    // within 3 sigma
    assert(math.abs(a.getAs[Double]("est") - 300.0) / 300.0 < 0.4)
  }

  test("ridgeNormalEq: lambda = 0 on exactly-linear data recovers the " +
    "generating coefficients") {
    val df = (1 to 100).map { i =>
      val x1 = i.toDouble; val x2 = (i % 7).toDouble
      (2.0 + 3.0 * x1 - 5.0 * x2, x1, x2)
    }.toDF("y", "x1", "x2")
    val betas = LinAlg.ridgeNormalEq(df, "y", "x1", "x2", lambda = 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(betas("intercept") - 2.0) < 1e-4)
    assert(math.abs(betas("x1") - 3.0) < 1e-4)
    assert(math.abs(betas("x2") - (-5.0)) < 1e-4)
  }

  test("ridgeNormalEq: growing lambda shrinks slope magnitudes") {
    val df = (1 to 50).map { i =>
      val x1 = i.toDouble; val x2 = (i % 5).toDouble
      (1.0 + 2.0 * x1 + 4.0 * x2, x1, x2)
    }.toDF("y", "x1", "x2")
    def slopes(lam: Double) =
      LinAlg.ridgeNormalEq(df, "y", "x1", "x2", lam)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val loose = slopes(0.0)
    val tight = slopes(1000.0)
    assert(math.abs(tight("x2")) < math.abs(loose("x2")))
  }

  test("holtLinear: constant series locks level to the constant and " +
    "trend to zero; row per observed day") {
    val day = 86400L * 1000000L
    // 4 days x 3 events each
    val df = (0 until 4).flatMap(d => (1 to 3).map(i => d * day + i * 1000L))
      .toDF("us").withColumn("ts", timestamp_micros(col("us")))
    val out = TimeSeries.holtLinear(df, "ts", alpha = 0.3, gamma = 0.2)
      .orderBy(col("day")).collect()
    assert(out.length === 4)
    assert(out.forall(r => math.abs(r.getAs[Double]("level") - 3.0) < 1e-8))
    assert(out.forall(r => math.abs(r.getAs[Double]("trend")) < 1e-8))
  }

  test("holtLinear: replays the textbook recursion exactly") {
    val day = 86400L * 1000000L
    val counts = Seq(2, 5, 3, 7) // events per day
    val df = counts.zipWithIndex.flatMap { case (n, d) =>
      (1 to n).map(i => d * day + i * 1000L)
    }.toDF("us").withColumn("ts", timestamp_micros(col("us")))
    val out = TimeSeries.holtLinear(df, "ts", alpha = 0.3, gamma = 0.2)
      .orderBy(col("day"))
      .select(col("x"), col("level"), col("trend"))
      .as[(Double, Double, Double)].collect()
    var s = 2.0; var b = 5.0 - 2.0
    val expected = Seq((2.0, s, b)) ++ counts.drop(1).map { n =>
      val sNew = 0.3 * n + 0.7 * (s + b)
      b = 0.2 * (sNew - s) + 0.8 * b
      s = sNew
      (n.toDouble, math.floor(s * 1e9) / 1e9, math.floor(b * 1e9) / 1e9)
    }
    assert(out.toSeq === expected)
  }

  test("holtLinear: fewer than two observed days yields no rows") {
    val df = Seq(1000L, 2000L).toDF("us")
      .withColumn("ts", timestamp_micros(col("us")))
    assert(TimeSeries.holtLinear(df, "ts").count() === 0)
  }
}

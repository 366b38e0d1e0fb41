package graft

import org.apache.spark.sql.functions._

import graft.operators.{Association, TimeSeries}

class MiEwmaSpec extends SparkSpec {
  import spark.implicits._

  test("mutualInformation: independent columns -> ~0; " +
    "deterministic coupling -> ln(alphabet size)") {
    // perfectly coupled: b = a, uniform over 4 symbols -> MI = ln 4
    val coupled = (1 to 400).map(i => (s"s${i % 4}", s"s${i % 4}"))
      .toDF("a", "b")
    val mi = Association.mutualInformation(coupled, "a", "b")
      .collect().head
    assert(mi.getAs[Long]("n") === 400L)
    assert(mi.getAs[Long]("n_cells") === 4L)
    assert(math.abs(mi.getAs[Double]("mi_nats") - math.log(4.0)) < 1e-9)
    // independent: a cycles mod 2, b cycles mod 5 over an exact
    // multiple of 10 rows -> every cell exactly uniform -> MI = 0
    val indep = (0 until 400).map(i => (s"a${i % 2}", s"b${i % 5}"))
      .toDF("a", "b")
    val mi0 = Association.mutualInformation(indep, "a", "b")
      .collect().head.getAs[Double]("mi_nats")
    assert(math.abs(mi0) < 1e-9)
  }

  test("ewmaTruncated: constant series converges to 1 - 2^-K; " +
    "impulse decays by exact halves") {
    val series = (1 to 20).map(i => ("k", i, 1.0)).toDF("key", "t", "v")
    val out = TimeSeries.ewmaTruncated(series, "key", "t", "v", halvings = 8)
      .orderBy(col("t")).collect().map(_.getAs[Double]("ewma"))
    // row 1 sees only itself: 0.5; row >= 8 sees the full kernel
    assert(out(0) === 0.5)
    assert(out(19) === (1.0 - math.pow(2.0, -8))) // exact: powers of two
    // unit impulse at t=1: ewma at t = 2^-t exactly, zero past K
    val impulse = (1 to 12).map(i => ("k", i, if (i == 1) 1.0 else 0.0))
      .toDF("key", "t", "v")
    val imp = TimeSeries.ewmaTruncated(impulse, "key", "t", "v", halvings = 8)
      .orderBy(col("t")).collect().map(_.getAs[Double]("ewma"))
    assert(imp(0) === 0.5 && imp(3) === 0.0625)
    assert(imp(8) === 0.0) // truncated: the K+1-th lag is forgotten
  }

  test("seriesCorrelation: perfectly co-moving keys -> r = 1; " +
    "anti-moving -> r = -1") {
    import java.sql.Timestamp
    def ts(day: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // key b = 2 * key a per day -> r = 1
    val df = (1 to 6).flatMap(d =>
      Seq(("a", ts(d), d * 1.0), ("b", ts(d), d * 2.0)))
      .toDF("k", "ts", "v")
    val r = TimeSeries.seriesCorrelation(df, "k", "ts", "v", "a", "b")
      .collect().head
    assert(r.getAs[Long]("n_days") === 6L)
    assert(math.abs(r.getAs[Double]("r") - 1.0) < 1e-9)
    // key c declines as a rises -> r = -1
    val df2 = (1 to 6).flatMap(d =>
      Seq(("a", ts(d), d * 1.0), ("c", ts(d), 10.0 - d)))
      .toDF("k", "ts", "v")
    val r2 = TimeSeries.seriesCorrelation(df2, "k", "ts", "v", "a", "c")
      .collect().head.getAs[Double]("r")
    assert(math.abs(r2 + 1.0) < 1e-9)
  }

  test("ewmaTruncated: keys smooth independently") {
    val df = Seq(("a", 1, 4.0), ("a", 2, 0.0), ("b", 1, 8.0))
      .toDF("key", "t", "v")
    val out = TimeSeries.ewmaTruncated(df, "key", "t", "v")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getAs[Double]("ewma")).toMap
    assert(out(("a", 1)) === 2.0)
    assert(out(("a", 2)) === 1.0) // 0*0.5 + 4*0.25
    assert(out(("b", 1)) === 4.0) // b never sees a's history
  }

  test("normalizedMutualInformation: 1 for identical partitions, " +
    "~0 for independence, NULL when one side has a single class") {
    import graft.operators.Association
    import org.apache.spark.sql.functions.col
    // identical partitions (relabeled): NMI = 1
    val same = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"),
      ("c", "z")).toDF("cl", "lab")
    val r1 = Association.normalizedMutualInformation(same, "cl", "lab")
      .collect().head
    assert(r1.getAs[Long]("n") === 5L)
    assert(r1.getAs[Long]("n_a_classes") === 3L)
    assert(math.abs(r1.getAs[Double]("nmi") - 1.0) < 1e-9)
    // independent 2x2 balanced: MI = 0 -> NMI = 0
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("cl", "lab")
    val r2 = Association.normalizedMutualInformation(indep, "cl", "lab")
      .collect().head
    assert(math.abs(r2.getAs[Double]("nmi")) < 1e-9)
    // degenerate single cluster: zero entropy -> NULL, not 0 or 1
    val single = Seq(("a", "x"), ("a", "y")).toDF("cl", "lab")
    val r3 = Association.normalizedMutualInformation(single, "cl", "lab")
      .select(col("nmi")).collect().head
    assert(r3.isNullAt(0))
  }
}

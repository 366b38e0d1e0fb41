package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Eda

class EdaSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("describe matches hand-computed stats incl. interpolated quartiles") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val r = Eda.describe(df, Seq("x")).head
    assert(r.getAs[Long]("n_count") === 4L)
    assert(r.getAs[Double]("mean") === 2.5)
    assert(math.abs(r.getAs[Double]("std") - math.sqrt(5.0 / 3)) < 1e-12)
    assert(r.getAs[Double]("p25") === 1.75)
    assert(r.getAs[Double]("p50") === 2.5)
    assert(r.getAs[Double]("p75") === 3.25)
  }

  test("describeApprox agrees with exact describe on small data") {
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val exact = Eda.describe(df, Seq("x")).head
    val approx = Eda.describeApprox(df, Seq("x")).head
    assert(approx.getAs[Double]("mean") === exact.getAs[Double]("mean"))
    assert(math.abs(approx.getAs[Double]("p50") - exact.getAs[Double]("p50")) <= 1.0)
  }

  test("histogram degenerates to one bucket on a constant column (no ANSI error)") {
    val df = Seq((5.0, "a"), (5.0, "b"), (5.0, "a")).toDF("x", "cls")
    val rows = Eda.histogram(df, "x", "cls", bins = 10).collect()
    assert(rows.forall(_.getLong(0) === 0L))
    assert(rows.map(_.getLong(2)).sum === 3L)
  }

  test("histogram: max value lands in the last bucket, not out of range") {
    val df = Seq((0.0, "a"), (10.0, "a")).toDF("x", "cls")
    val buckets = Eda.histogram(df, "x", "cls", bins = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(buckets === Map(0L -> 1L, 4L -> 1L))
  }

  test("profile: one row per column with nulls, distincts, numeric min/max") {
    val df = Seq(
      (Some(1L), Some("a"), Some(2.5)),
      (Some(2L), None, Some(-1.0)),
      (Some(2L), Some("b"), None)
    ).toDF("id", "s", "v")
    val rows = Eda.profile(df, Seq("id", "s", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("id", "s", "v"))
    val id = rows("id")
    assert(id.getLong(1) === 3L && id.getLong(2) === 0L && id.getLong(3) === 2L)
    assert(id.getDouble(4) === 1.0 && id.getDouble(5) === 2.0)
    val s = rows("s")
    assert(s.getLong(2) === 1L && s.getLong(3) === 2L)
    assert(s.isNullAt(4) && s.isNullAt(5)) // non-numeric: no min/max
    val v = rows("v")
    assert(v.getLong(2) === 1L && v.getLong(3) === 2L)
    assert(v.getDouble(4) === -1.0 && v.getDouble(5) === 2.5)
  }

  test("winsorize clamps tails to the exact percentile bounds, keeps all rows") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val w = graft.operators.NumericFeatures
      .winsorize(df, "v", pLo = 0.1, pHi = 0.9)
    assert(w.count() === 100)
    // exact percentile of 1..100 at 0.1/0.9 interpolates to 10.9 / 90.1
    val (mn, mx) = w.agg(min($"winsorized"), max($"winsorized"))
      .as[(Double, Double)].head()
    assert(mn === 10.9 +- 1e-12 && mx === 90.1 +- 1e-12)
    // interior values untouched
    assert(w.filter($"v" === 50.0).head.getAs[Double]("winsorized") === 50.0)
    // nulls stay null — least/greatest would otherwise rewrite a
    // missing measurement into the upper bound
    val withNull = (1 to 100).map(i => Some(i.toDouble)).:+(None).toDF("v")
    val wn = graft.operators.NumericFeatures
      .winsorize(withNull, "v", pLo = 0.1, pHi = 0.9)
    assert(wn.filter($"v".isNull).head.isNullAt(1))
    assert(wn.count() === 101)
  }

  test("standardizeByKey keeps null-key rows and z-scores them as a group") {
    val df = Seq((Some("a"), 1.0), (Some("a"), 3.0),
      (None, 10.0), (None, 14.0)).toDF("k", "v")
    val z = graft.operators.NumericFeatures.standardizeByKey(df, "k", "v")
    assert(z.count() === 4) // null-key rows NOT dropped
    val nullz = z.filter($"k".isNull).select($"v", $"zscore").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // mean 12, sample std sqrt(8): z = ±2/sqrt(8)
    assert(math.abs(nullz(10.0) - (-2.0 / math.sqrt(8))) < 1e-12)
    assert(math.abs(nullz(14.0) - (2.0 / math.sqrt(8))) < 1e-12)
  }

  test("standardizeByKey: hand-computed z-scores; degenerate groups null") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), // mean 2, sample std 1
      ("b", 5.0),                         // single row: std null
      ("c", 4.0), ("c", 4.0)              // zero variance: std 0 -> null
    ).toDF("k", "v")
    val z = graft.operators.NumericFeatures.standardizeByKey(df, "k", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val byKV = z.groupBy(t => (t._1, t._2)).view.mapValues(_.head._3).toMap
    assert(byKV(("a", 1.0)) === Some(-1.0))
    assert(byKV(("a", 2.0)) === Some(0.0))
    assert(byKV(("a", 3.0)) === Some(1.0))
    assert(byKV(("b", 5.0)) === None)
    assert(byKV(("c", 4.0)) === None)
  }

  test("robustScaleByKey: hand-computed median/IQR scaling; zero-IQR null; outlier-insensitive") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 1000.0),
      ("b", 7.0), ("b", 7.0)).toDF("k", "v")
    // group a: q1=2, med=3, q3=4 (interpolated over 5 values) -> iqr 2;
    // the 1000.0 outlier moves none of them (that's the point)
    val got = graft.operators.NumericFeatures.robustScaleByKey(df, "k", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .groupBy(t => (t._1, t._2)).view.mapValues(_.head._3).toMap
    assert(got(("a", 3.0)) === Some(0.0))
    assert(got(("a", 1.0)) === Some(-1.0))
    assert(got(("a", 1000.0)) === Some(498.5))
    assert(got(("b", 7.0)) === None) // zero IQR -> null, not Infinity
  }

  test("dropOutliersIqr removes only fence-breakers; nulls kept") {
    // 13 non-null values (outliers count toward the quartiles): sorted
    // [-50, 1..11, 100] -> q1 = 3, q3 = 9, iqr = 6 -> fences [-6, 18]
    val df = ((1 to 11).map(i => Some(i.toDouble)) ++
      Seq(Some(100.0), Some(-50.0), None)).toDF("v")
    val kept = graft.operators.NumericFeatures.dropOutliersIqr(df, "v")
    assert(kept.count() === 12) // 11 in-fence + the null
    assert(kept.filter($"v".isNull).count() === 1)
    assert(kept.filter($"v" === 100.0 || $"v" === -50.0).count() === 0)
    // k = 0: only [q1, q3] = [3, 9] survives
    val tight = graft.operators.NumericFeatures.dropOutliersIqr(df, "v", k = 0)
    assert(tight.filter($"v".isNotNull).count() === 7) // 3..9
  }

  test("topKPerGroup: hand-computed ranks, count-desc then value-asc ties") {
    val df = Seq(
      ("d1", 7L), ("d1", 7L), ("d1", 7L), // 7 -> count 3
      ("d1", 2L), ("d1", 2L),             // 2 -> count 2
      ("d1", 9L), ("d1", 9L),             // 9 -> count 2 (tie: 2 before 9)
      ("d1", 5L),                         // 5 -> count 1, cut at k=3
      ("d2", 1L)
    ).toDF("g", "v")
    val got = Eda.topKPerGroup(df, "g", "v", k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.filter(_._1 == "d1").sortBy(_._2).toSeq === Seq(
      ("d1", 1L, 7L, 3L), ("d1", 2L, 2L, 2L), ("d1", 3L, 9L, 2L)))
    assert(got.filter(_._1 == "d2").toSeq === Seq(("d2", 1L, 1L, 1L)))
  }

  test("profile approx mode keeps the same shape with HLL distincts") {
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("a", "b")
    val rows = Eda.profile(df, Seq("a", "b"), exact = false).collect()
    assert(rows.length === 2)
    // HLL estimate is within its published 5% band on this cardinality
    val a = rows.find(_.getString(0) == "a").get
    assert(math.abs(a.getLong(3) - 100L) <= 10L)
  }

  test("benfordAudit: digit classification, grid completeness, hand-computed chi2") {
    // group g1: values with leading digits 1,1,2 (incl. <1 and negative
    // forms); group g2: a perfect single-digit pile-up
    val df = Seq(
      ("g1", 123.4), ("g1", 0.19), ("g1", -25.0),
      ("g2", 9.0), ("g2", 900.0), ("g2", 0.0009)).toDF("g", "v")
    val got = Eda.benfordAudit(df, "v", "g")
      .orderBy($"g", $"digit").collect()
    assert(got.length === 18) // 2 groups x 9 digits, zeros included
    val g1 = got.filter(_.getString(0) == "g1")
    assert(g1.map(r => r.getString(1) -> r.getLong(2)).toMap
      === Map("1" -> 2L, "2" -> 1L, "3" -> 0L, "4" -> 0L, "5" -> 0L,
        "6" -> 0L, "7" -> 0L, "8" -> 0L, "9" -> 0L))
    assert(g1.forall(_.getLong(3) === 3L)) // n_total
    // chi2 recomputed by hand from the same expectation constants
    val expChi2 = (1 to 9).map { d =>
      val e = 3.0 * math.log10(1.0 + 1.0 / d)
      val o = Map(1 -> 2.0, 2 -> 1.0).getOrElse(d, 0.0)
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(g1.head.getDouble(6) - expChi2) < 1e-9)
    // g2: all mass on digit 9 -> a large chi2; classification ignores
    // magnitude (9.0, 900.0, 0.0009 all lead with 9)
    val g2 = got.filter(_.getString(0) == "g2")
    assert(g2.map(r => r.getString(1) -> r.getLong(2)).toMap.apply("9") === 3L)
    // zero values have no leading digit: a group of only zeros vanishes
    val zeros = Eda.benfordAudit(
      Seq(("z", 0.0), ("z", 0.0)).toDF("g", "v"), "v", "g").collect()
    assert(zeros.isEmpty)
  }
}

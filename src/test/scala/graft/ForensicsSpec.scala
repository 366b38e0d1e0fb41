package graft

import org.apache.spark.sql.functions._

import graft.operators.Forensics

class ForensicsSpec extends SparkSpec {
  import spark.implicits._

  test("benfordDigitAudit: digit extraction is scale-invariant, all " +
    "nine digits emitted, zero-obs digits count at expectation") {
    // amounts with leading digits 1,1,2,9; null/zero/negative dropped
    val df = Seq(("a", Some(1.23)), ("a", Some(0.19)), ("a", Some(25.0)),
      ("a", Some(900.5)), ("a", None), ("a", Some(0.0)), ("a", Some(-4.0)))
      .toDF("grp", "value")
    val rows = Forensics.benfordDigitAudit(df, "grp", "value").collect()
    assert(rows.length === 9)
    val byDigit = rows.map(r => r.getInt(1) ->
      (r.getAs[Long]("n_obs"), r.getAs[Double]("benford_p"))).toMap
    assert(byDigit(1)._1 === 2L) // 1.23 -> 123, 0.19 -> 19
    assert(byDigit(2)._1 === 1L)
    assert(byDigit(9)._1 === 1L)
    assert((3 to 8).forall(byDigit(_)._1 === 0L))
    // benford_p(1) = log10(2) ~ 0.301029995663
    assert(math.abs(byDigit(1)._2 - 0.301029995663) < 1e-11)
    // chi2 identical on every row of the group and hand-checkable
    val n = 4.0
    val expected = (1 to 9).map { d =>
      val p = math.log((d + 1.0) / d) / math.log(10.0)
      val obs = byDigit(d)._1.toDouble
      (obs - n * p) * (obs - n * p) / (n * p)
    }.sum
    val chi2s = rows.map(_.getAs[Double]("chi2")).distinct
    assert(chi2s.length === 1)
    assert(math.abs(chi2s.head - math.floor(expected * 1e6) / 1e6) < 1e-6)
  }

  test("roundAmountBias: whole and ten-unit shares from exact cents") {
    val df = Seq(("a", 10.00), ("a", 3.00), ("a", 2.50), ("a", 7.77),
      ("b", 100.00)).toDF("grp", "value")
    val got = Forensics.roundAmountBias(df, "grp", "value").collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_amounts"),
        r.getAs[Long]("n_whole"), r.getAs[Long]("n_tens"),
        r.getAs[Double]("whole_share"), r.getAs[Double]("tens_share"))))
      .toMap
    assert(got("a") === ((4L, 2L, 1L, 0.5, 0.25)))
    assert(got("b") === ((1L, 1L, 1L, 1.0, 1.0)))
  }
}

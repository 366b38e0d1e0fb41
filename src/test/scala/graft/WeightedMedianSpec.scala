package graft

import graft.operators.RankStats

class WeightedMedianSpec extends SparkSpec {
  import spark.implicits._

  test("weightedMedianByGroup: hand-checked crossings, per-group " +
    "independence, unit weights reduce to the lower median") {
    // group a: values 1(w3), 2(w1), 10(w4): W=8, crossing at cum>=4 -> 2
    // group b: unit weights over 1..4: W=4, crossing at cum>=2 -> 2
    val df = Seq(
      ("a", 1.0, 3.0), ("a", 2.0, 1.0), ("a", 10.0, 4.0),
      ("b", 1.0, 1.0), ("b", 2.0, 1.0), ("b", 3.0, 1.0), ("b", 4.0, 1.0))
      .toDF("g", "v", "w")
    val out = RankStats.weightedMedianByGroup(df, "g", "v", "w")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("weighted_median"), r.getAs[Double]("total_weight")))
      .toMap
    assert(out("a") === ((2.0, 8.0)))
    assert(out("b") === ((2.0, 4.0)))
  }

  test("weightedMedianByGroup: one dominant weight pins the median") {
    val df = Seq(("g", 5.0, 100.0), ("g", 1.0, 1.0), ("g", 9.0, 1.0))
      .toDF("g", "v", "w")
    val r = RankStats.weightedMedianByGroup(df, "g", "v", "w")
      .collect().head
    assert(r.getAs[Double]("weighted_median") === 5.0)
    assert(r.getAs[Long]("n") === 3L)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Experiment, Fusion}

class CausalFusionSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedAte: recovers a constant effect under confounded mix") {
    // effect +2 in every stratum, but treatment rate and baseline both
    // differ by stratum — naive diff is biased, standardized is exactly 2
    val rows =
      // stratum A: baseline 10, 3 treated 1 control
      Seq(("A", 1, 12.0), ("A", 1, 12.0), ("A", 1, 12.0), ("A", 0, 10.0),
        // stratum B: baseline 50, 1 treated 3 control
        ("B", 1, 52.0), ("B", 0, 50.0), ("B", 0, 50.0), ("B", 0, 50.0))
    val df = rows.toDF("s", "tr", "y")
    val r = Experiment.stratifiedAte(df, "s", "tr", "y").collect().head
    assert(r.getAs[Long]("n") === 8L)
    assert(r.getAs[Long]("n_strata") === 2L)
    assert(math.abs(r.getAs[Double]("ate") - 2.0) < 1e-9)
    // naive would be far off: treated mean (3*12+52)/4 = 22 vs
    // control (10+150)/4 = 40 -> -18; the stratification fixes it
  }

  test("stratifiedAte: a stratum missing an arm nulls the total") {
    val df = Seq(("A", 1, 1.0), ("A", 0, 0.0), ("B", 1, 5.0))
      .toDF("s", "tr", "y")
    val r = Experiment.stratifiedAte(df, "s", "tr", "y").collect().head
    assert(r.isNullAt(r.fieldIndex("ate")))
  }

  test("diffInDiff: removes shared trend and group baseline exactly") {
    // control drifts +3; treated drifts +3 plus effect +4
    val df = Seq(
      (1, 0, 10.0), (1, 0, 12.0), (1, 1, 18.0), (1, 1, 20.0),
      (0, 0, 5.0), (0, 0, 7.0), (0, 1, 9.0), (0, 1, 11.0))
      .toDF("tr", "post", "y")
    val r = Experiment.diffInDiff(df, "tr", "post", "y").collect().head
    assert(r.getAs[Double]("m_tpre") === 11.0)
    assert(r.getAs[Double]("m_cpost") === 10.0)
    assert(math.abs(r.getAs[Double]("did") - 4.0) < 1e-9)
  }

  test("rrfFuse: two-list consensus beats a single first place; " +
    "topN and tie-break honored") {
    // d2 is 2nd on BOTH rankers (2/62); d1 and d3 lead one list each
    // but appear nowhere else (1/61 < 2/62): consensus wins
    val ranked = Seq(
      (0, "d1", "a", 1L), (0, "d2", "a", 2L),
      (0, "d3", "b", 1L), (0, "d2", "b", 2L))
      .toDF("q", "doc", "ranker", "rnk")
    val out = Fusion.rrfFuse(ranked, "q", "doc", "ranker", "rnk",
      k = 60, topN = 2).orderBy(col("fused_rank")).collect()
    assert(out.length === 2)
    assert(out.head.getAs[String]("doc") === "d2")
    assert(out.head.getAs[Long]("n_rankers") === 2L)
    // d1 and d3 tie on score (a solo 1st each): doc name breaks it
    assert(out(1).getAs[String]("doc") === "d1")
    assert(out(1).getAs[Long]("n_rankers") === 1L)
  }
}

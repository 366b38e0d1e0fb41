package graft

import graft.operators.Valuation
import org.apache.spark.sql.functions.col

class ValuationSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force Shapley by definition: all subsets of the train set,
    * factorial weights, kNN utility v(S) = (1/K) * matches among the
    * min(K,|S|) nearest members of S.
    */
  private def bruteShapley(
      train: Seq[(Long, Array[Float], Int)],
      test: Seq[(Array[Float], Int)],
      k: Int): Map[Long, Double] = {
    def fact(n: Int): Double = (1 to n).map(_.toDouble).product
    val n = train.size
    def sqDist(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y.toDouble) *
        (x.toDouble - y.toDouble) }.sum
    def value(id: Long): Double = test.map { case (tv, ty) =>
      def util(s: Set[Long]): Double =
        if (s.isEmpty) 0.0
        else train.filter(t => s.contains(t._1))
          .sortBy(t => (sqDist(t._2, tv), t._1))
          .take(k).count(_._3 == ty).toDouble / k
      val others = train.map(_._1).filterNot(_ == id)
      others.toSet.subsets().map { s =>
        fact(s.size) * fact(n - 1 - s.size) / fact(n) *
          (util(s + id) - util(s))
      }.sum
    }.sum / test.size
    train.map(t => t._1 -> value(t._1)).toMap
  }

  test("knnShapley: closed form matches brute-force subset enumeration") {
    // 6 train points on a line, mixed labels, distinct distances
    val train = Seq(
      (1L, Array(1.0f, 0f), 1), (2L, Array(2.0f, 0f), 0),
      (3L, Array(4.0f, 0f), 1), (4L, Array(7.0f, 0f), 1),
      (5L, Array(11.0f, 0f), 0), (6L, Array(16.0f, 0f), 1))
    val test = Seq(
      (10L, Array(0.0f, 0f), 1), (11L, Array(20.0f, 0f), 0))
    val got = Valuation.knnShapley(
      train.toDF("id", "vec", "y"), test.map(t => (t._1, t._2, t._3))
        .toDF("id", "vec", "y"),
      "id", "vec", "y", k = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = bruteShapley(train, test.map(t => (t._2, t._3)), k = 2)
    assert(got.keySet === train.map(_._1).toSet)
    train.foreach { case (id, _, _) =>
      assert(math.abs(got(id) - want(id)) < 1e-9,
        s"train $id: got ${got(id)} want ${want(id)}")
    }
    // efficiency: values sum to the utility of the full set (per-panel
    // mean), since v(empty) = 0
    val full = test.map { case (_, tv, ty) =>
      train.sortBy { t =>
        t._2.zip(tv).map { case (x, y) =>
          (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
      }(Ordering.Double.TotalOrdering)
        .take(2).count(_._3 == ty).toDouble / 2
    }.sum / test.size
    assert(math.abs(got.values.sum - full) < 1e-9)
  }

  test("knnShapley: complete candidate table reproduces the exact " +
    "arity; truncation is restriction; dups dedup") {
    val train = Seq(
      (1L, Array(1.0f, 0f), 1), (2L, Array(2.0f, 0f), 0),
      (3L, Array(4.0f, 0f), 1), (4L, Array(7.0f, 0f), 1),
      (5L, Array(11.0f, 0f), 0), (6L, Array(16.0f, 0f), 1))
    val trainDf = train.toDF("id", "vec", "y")
    val testDf = Seq(
      (10L, Array(0.0f, 0f), 1), (11L, Array(20.0f, 0f), 0))
      .toDF("id", "vec", "y")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val exact = rows(Valuation.knnShapley(
      trainDf, testDf, "id", "vec", "y", k = 2))
    val allPairs = trainDf.select(col("id").as("train_id"))
      .crossJoin(testDf.select(col("id").as("test_id")))
    val viaCand = rows(Valuation.knnShapley(
      trainDf, testDf, "id", "vec", "y", k = 2, allPairs))
    assert(viaCand === exact)
    val viaDup = rows(Valuation.knnShapley(
      trainDf, testDf, "id", "vec", "y", k = 2,
      allPairs.unionAll(allPairs)))
    assert(viaDup === exact)

    // dropping train row 6 from every candidate list = valuing the
    // corpus without it (truncation is restriction); row 6 gets no
    // value row at all
    val minus6 = rows(Valuation.knnShapley(
      trainDf, testDf, "id", "vec", "y", k = 2,
      allPairs.filter(col("train_id") =!= 6L)))
    val exactMinus6 = rows(Valuation.knnShapley(
      trainDf.filter(col("id") =!= 6L), testDf, "id", "vec", "y", k = 2))
    assert(minus6 === exactMinus6)
    assert(!minus6.contains(6L))
  }

  test("knnShapley: null/empty train vectors drop, k >= 1 enforced") {
    val train = Seq(
      (1L, Array(1.0f), 1), (2L, Array(2.0f), 0))
      .toDF("id", "vec", "y")
      .unionByName(Seq((3L, Array.empty[Float], 1)).toDF("id", "vec", "y"))
    val test = Seq((9L, Array(0.0f), 1)).toDF("id", "vec", "y")
    val out = Valuation.knnShapley(train, test, "id", "vec", "y", k = 1)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 2L))
    intercept[IllegalArgumentException] {
      Valuation.knnShapley(train, test, "id", "vec", "y", k = 0)
    }
  }
}

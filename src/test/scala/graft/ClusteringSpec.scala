package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    // two tight blobs around (0,0) and (10,10), one outlier
    (0L, Array(0.0f, 0.1f)), (1L, Array(10.0f, 10.1f)),
    (2L, Array(0.2f, -0.1f)), (3L, Array(-0.1f, 0.0f)),
    (4L, Array(9.8f, 10.0f)), (5L, Array(10.2f, 9.9f)),
    (6L, Array(0.1f, 0.2f)), (7L, Array(10.1f, 10.2f))
  ).toDF("vec_id", "embedding")

  private def init = vecs.filter($"vec_id" < 2)
    .select($"vec_id".as("cid"), $"embedding".as("cvec"))

  test("lloydKMeans converges to the two blob means") {
    val cent = Clustering.lloydKMeans(vecs, "vec_id", "embedding", init, 3)
    val m = cent.collect()
      .map(r => (r.getLong(0), r.getAs[Long]("dim"), r.getAs[Double]("coord")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // blob 0: vecs 0,2,3,6 -> mean (0.05, 0.05); blob 1: 1,4,5,7 -> (10.025, 10.05)
    assert(math.abs(m(0L).head - 0.05) < 1e-6)
    assert(math.abs(m(0L)(1) - 0.05) < 1e-6)
    assert(math.abs(m(1L).head - 10.025) < 1e-6)
    assert(math.abs(m(1L)(1) - 10.05) < 1e-6)
  }

  test("kmeansCells: counts and inertia non-increasing across rounds") {
    val c1 = Clustering.lloydKMeans(vecs, "vec_id", "embedding", init, 1)
    val c3 = Clustering.lloydKMeans(vecs, "vec_id", "embedding", init, 3)
    def totalInertia(c: org.apache.spark.sql.DataFrame): Double =
      Clustering.kmeansCells(vecs, "vec_id", "embedding", c)
        .agg(sum($"inertia")).head.getDouble(0)
    val cells = Clustering.kmeansCells(vecs, "vec_id", "embedding", c3)
      .orderBy($"cid").collect()
    assert(cells.map(_.getAs[Long]("n_members")).toSeq === Seq(4L, 4L))
    assert(totalInertia(c3) <= totalInertia(c1) + 1e-12)
  }

  test("empty cells keep their previous centroid") {
    // second init centroid is unreachable: every point is nearer c0
    val farInit = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(1e6, 1e6))
    ).toDF("cid", "cvec")
    val near = Seq((0L, Array(1.0f, 1.0f)), (1L, Array(2.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val cent = Clustering.lloydKMeans(near, "vec_id", "embedding", farInit, 2)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("coord")))
    assert(cent.filter(_._1 == 1L).map(_._2).toSet === Set(1e6))
    assert(cent.filter(_._1 == 0L).map(_._2).toSet === Set(1.5))
  }

  test("assembleCentroids restores array form ordered by dim") {
    val cent = Clustering.lloydKMeans(vecs, "vec_id", "embedding", init, 2)
    val arr = Clustering.assembleCentroids(cent).orderBy($"cell").collect()
    assert(arr.length === 2)
    assert(arr.head.getAs[Seq[Double]]("cvec").length === 2)
  }
}

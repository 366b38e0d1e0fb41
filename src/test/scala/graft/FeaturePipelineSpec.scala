package graft

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._

import graft.ml.FeaturePipeline
import graft.ml.FeaturePipeline.FeatureConfig

class FeaturePipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val train = Seq(
    (1.0, "Ads", 0), (2.0, "SEO", 0), (3.0, "Direct", 1), (4.0, "Ads", 1)
  ).toDF("amount", "source", "label")

  private val cfg = FeatureConfig(Seq("amount"), Seq("source"))

  test("pipeline output width = numerics + seen categories (keep slot dropped)") {
    val (model, out, _) = FeaturePipeline.fitTransform(train, train.limit(0), cfg)
    val v = out.select("features").head.getAs[Vector](0)
    assert(v.size === 1 + 3)
    assert(FeaturePipeline.featureNames(model, cfg) ===
      Seq("num__amount", "cat__source_Ads", "cat__source_Direct", "cat__source_SEO"))
  }

  test("unseen category at transform encodes all-zeros (handle_unknown='ignore')") {
    val test = Seq((9.0, "Organic", 0)).toDF("amount", "source", "label")
    val (_, _, outTest) = FeaturePipeline.fitTransform(train, test, cfg)
    val v = outTest.select("features").head.getAs[Vector](0)
    // slots 1..3 are the categorical block: all zero for unseen
    assert((1 to 3).forall(i => v(i) === 0.0))
  }

  test("scaler fit on train only: train mean ~0, std ~1 (ddof=1)") {
    val (_, outTrain, _) = FeaturePipeline.fitTransform(train, train.limit(0), cfg)
    val xs = outTrain.select("features").collect().map(_.getAs[Vector](0)(0))
    val mean = xs.sum / xs.length
    val std = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1))
    assert(math.abs(mean) < 1e-9)
    assert(math.abs(std - 1.0) < 1e-9)
  }

  test("categorical-only and numeric-only configs both assemble") {
    val catOnly = FeatureConfig(Nil, Seq("source"))
    val (m1, o1, _) = FeaturePipeline.fitTransform(train, train.limit(0), catOnly)
    assert(o1.select("features").head.getAs[Vector](0).size === 3)
    assert(FeaturePipeline.featureNames(m1, catOnly).size === 3)
    val numOnly = FeatureConfig(Seq("amount"), Nil)
    val (m2, o2, _) = FeaturePipeline.fitTransform(train, train.limit(0), numOnly)
    assert(o2.select("features").head.getAs[Vector](0).size === 1)
    assert(FeaturePipeline.featureNames(m2, numOnly) === Seq("num__amount"))
  }
}

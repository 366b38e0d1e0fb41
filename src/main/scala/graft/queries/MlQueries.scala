package graft.queries

import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.functions._

import graft.ml.FeaturePipeline
import graft.ml.FeaturePipeline.FeatureConfig
import graft.operators.{Balance, Smote, Split}
import graft.sources.Tables

/** M4/M5: ML-prep operators (SURVEY.md §2.8/§2.9). Membership of random
  * splits/samples is seed-dependent and engine-specific, but the *sizes*
  * are exactly determined — so the oracles check the size contracts,
  * while unit specs cover membership invariants (disjointness,
  * subset-ness, synthetic-point geometry).
  */
object MlQueries {

  /** T1: stratified 80/20 split — per-class test size is exactly
    * ceil(n * 0.2), train the rest (sklearn sizing).
    */
  val q40SplitSummary = HarnessQuery(
    "q40_split_summary",
    (spark, dir) =>
      Split.summary(
        Tables.embeddings(spark, dir)
          .withColumn("label", col("label").cast("long")),
        "label", testFrac = 0.2, seed = 42L, tieBreak = Seq(col("vec_id"))),
    Some("""
      SELECT CAST(label AS BIGINT) AS label,
             n - CAST(ceil(n * 0.2) AS BIGINT) AS n_train,
             CAST(ceil(n * 0.2) AS BIGINT) AS n_test
      FROM (SELECT label, count(*) AS n FROM embeddings GROUP BY label) t
      ORDER BY label
    """.trim))

  /** T3: undersampling levels every class at the minority size. */
  val q41UndersampleCounts = HarnessQuery(
    "q41_undersample_counts",
    (spark, dir) =>
      Balance.classCounts(
        Balance.undersample(
          Tables.embeddings(spark, dir)
            .withColumn("label", col("label").cast("long")),
          "label", seed = 42L, tieBreak = Seq(col("vec_id"))),
        "label"),
    Some("""
      SELECT CAST(label AS BIGINT) AS label,
             (SELECT min(cnt) FROM
               (SELECT count(*) AS cnt FROM embeddings GROUP BY label) m) AS count
      FROM embeddings GROUP BY label ORDER BY 1
    """.trim))

  /** T2: SMOTE lifts the minority class exactly to the majority size. */
  val q42SmoteCounts = HarnessQuery(
    "q42_smote_counts",
    (spark, dir) => {
      val df = Tables.embeddings(spark, dir)
        .withColumn("y", when(col("label") === 0, 0L).otherwise(1L))
        .withColumn("feat", col("embedding").cast("array<double>"))
        .select(col("vec_id"), col("y"), col("feat"))
      Balance.classCounts(
        Smote.smote(df, "y", "feat", k = 5, seed = 42L,
          idCol = Some("vec_id")), "y")
        .withColumnRenamed("y", "label")
    },
    Some("""
      WITH c AS (SELECT CASE WHEN label = 0 THEN 0 ELSE 1 END AS y,
                        count(*) AS cnt
                 FROM embeddings GROUP BY 1)
      SELECT CAST(y AS BIGINT) AS label, (SELECT max(cnt) FROM c) AS count
      FROM c ORDER BY 1
    """.trim))

  /** M1-M5: the full featurization pipeline over customer — output width
    * is 1 scaled numeric + one slot per training-seen segment (the
    * dropped keep-slot reproduces sklearn handle_unknown='ignore').
    */
  val q43FeaturePipeline = HarnessQuery(
    "q43_feature_pipeline",
    (spark, dir) => {
      val cust = Tables.customer(spark, dir)
      val cfg = FeatureConfig(Seq("c_acctbal"), Seq("c_mktsegment"))
      val (_, out, _) = FeaturePipeline.fitTransform(cust, cust.limit(0), cfg)
      out.agg(
        count(lit(1)).as("n_rows"),
        first(size(vector_to_array(col("features")))).cast("long")
          .as("n_features"))
    },
    Some("""
      SELECT count(*) AS n_rows,
             1 + count(DISTINCT c_mktsegment) AS n_features
      FROM customer
    """.trim))

  /** M6: get_feature_names_out parity — numeric passthrough name plus
    * one alphabetically-ordered name per seen category.
    */
  val q44FeatureNames = HarnessQuery(
    "q44_feature_names",
    (spark, dir) => {
      val cust = Tables.customer(spark, dir)
      val cfg = FeatureConfig(Seq("c_acctbal"), Seq("c_mktsegment"))
      val model = FeaturePipeline.build(cfg).fit(cust)
      val names = FeaturePipeline.featureNames(model, cfg)
      import spark.implicits._
      names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
        .toDF("idx", "feature_name").orderBy(col("idx"))
    },
    Some("""
      SELECT CAST(row_number() OVER (ORDER BY ord, nm) AS BIGINT) - 1 AS idx,
             nm AS feature_name
      FROM (SELECT 0 AS ord, 'num__c_acctbal' AS nm
            UNION ALL
            SELECT 1, 'cat__c_mktsegment_' || s
            FROM (SELECT DISTINCT c_mktsegment AS s FROM customer) segs)
      ORDER BY idx
    """.trim))

  def all: Seq[HarnessQuery] = Seq(
    q40SplitSummary, q41UndersampleCounts, q42SmoteCounts,
    q43FeaturePipeline, q44FeatureNames)
}

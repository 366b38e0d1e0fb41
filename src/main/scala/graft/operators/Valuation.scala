package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Training-data valuation — "which corpus rows actually help the
  * model" — via the EXACT Shapley value of every training point under
  * a K-nearest-neighbor utility (Jia et al., PVLDB 2019): the one
  * Shapley game with a closed form, so a 100 TB curation pipeline can
  * score every training row without Monte-Carlo permutations. Rows
  * with consistently negative value are mislabeled/poisonous
  * candidates (the drop list); high-value rows are what selection
  * should keep — the per-row companion to corpus-level selection
  * ([[Selection]], [[Mixture]]).
  *
  * For one test point, sort training points by distance
  * (alpha_1..alpha_N nearest-first); then
  *
  *   s(alpha_N) = 1[y_N = y] / N
  *   s(alpha_j) = s(alpha_j+1)
  *              + (1[y_j = y] - 1[y_j+1 = y]) / K * min(K, j) / j
  *
  * i.e. each point's value is a SUFFIX SUM over the ranked tail — one
  * ranking window plus one suffix-frame window per test point, no
  * recursion. The overall value of a training row is its mean over
  * the test panel.
  */
object Valuation {

  /** Exact kNN-Shapley of every `train` row against a `test` panel.
    *
    * Dataflow: the panel broadcasts (valuation panels are small by
    * design — a held-out eval set); the corpus never shuffles whole
    * vectors except into the |train| x |test| scored pairs. Distances
    * fold in-row through the exact decimal dot ([[Similarity.dot]] on
    * the difference vector), the per-rank terms quantize to
    * DECIMAL(30,18) and suffix-sum exactly (order-independent), and
    * the final per-row mean is a decimal fold / exact count rounded at
    * 12 dp — the whole computation replays bit-for-bit in SQL (harness
    * q384).
    *
    * Scale note: this exact arity scores ALL (train, test) pairs and
    * each test point's ranking is one window partition, so one task
    * sees all N candidate rows for that test point. That is fine for N
    * in the hundreds of millions of (id, double) pairs; at full 100 TB
    * corpus scale use the candidate-parameterized overload below with
    * an LSH/IVF prefilter ([[Similarity.lshCandidatePairs]]) — the
    * truncated estimator standard in practice (rank-j terms decay like
    * min(K, j)/j).
    *
    * @param train (idCol, vecCol, labelCol) corpus to value
    * @param test  held-out panel, same columns; broadcast
    * @param k     the K of the kNN utility
    * @return (idCol, shapley) — one row per train row with a non-null,
    *         non-empty vector; shapley rounded at 12 dp
    */
  def knnShapley(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int): DataFrame = {
    val (tr, te) = shapleySides(train, test, idCol, vecCol, labelCol)
    shapleyCore(tr.crossJoin(te), idCol, k)
  }

  /** Candidate-parameterized kNN-Shapley — the truncated estimator at
    * corpus scale: rank and value only the (train_id, test_id) pairs
    * of a candidate table ([[Similarity.lshCandidatePairs]], IVF cell
    * routing, any blocker) instead of all |train|x|test| pairs. Each
    * test point's ranking window then sees its candidate rows only —
    * the suffix-sum recursion runs over the candidate ranking with N =
    * that candidate count (the standard truncation: rank-j terms decay
    * like min(K,j)/j, so far-away rows contribute negligibly — Jia et
    * al.'s own recommendation for web-scale corpora). Train rows that
    * appear in no candidate pair receive no value row (they were never
    * anyone's neighbor). With an all-pairs candidate table this is
    * row-identical to the exact arity (spec-pinned).
    *
    * @param candidates (train_id, test_id) pairs; duplicates deduped
    */
  def knnShapley(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      candidates: DataFrame): DataFrame = {
    val (tr, te) = shapleySides(train, test, idCol, vecCol, labelCol)
    val pairs = candidates
      .select(col("train_id").as("__rid"), col("test_id").as("__tid"))
      .distinct()
    shapleyCore(pairs.join(tr, Seq("__rid")).join(te, Seq("__tid")),
      idCol, k)
  }

  private def shapleySides(
      train: DataFrame, test: DataFrame, idCol: String, vecCol: String,
      labelCol: String): (DataFrame, DataFrame) = {
    def ok(c: Column) = c.isNotNull && size(c) > 0
    val tr = train.filter(ok(col(vecCol)))
      .select(col(idCol).as("__rid"), col(vecCol).as("__rv"),
        col(labelCol).as("__ry"))
    val te = broadcast(test.filter(ok(col(vecCol)))
      .select(col(idCol).as("__tid"), col(vecCol).as("__tv"),
        col(labelCol).as("__ty")))
    (tr, te)
  }

  /** The ranking + suffix-sum on joined (__tid, __rid, __tv, __rv,
    * __ty, __ry) pair rows — shared by the exact and candidate
    * arities.
    */
  private def shapleyCore(
      joined: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val diff = zip_with(col("__tv"), col("__rv"),
      (x, y) => x.cast("double") - y.cast("double"))
    val scored = joined
      .select(col("__tid"), col("__rid"),
        Similarity.dot(diff, diff).as("__dist"),
        when(col("__ry") === col("__ty"), 1).otherwise(0).as("__ind"))
    val byRank = Window.partitionBy(col("__tid"))
      .orderBy(col("__dist"), col("__rid"))
    val whole = Window.partitionBy(col("__tid"))
    val ranked = scored
      .withColumn("__j", row_number().over(byRank))
      .withColumn("__n", count(lit(1)).over(whole))
      .withColumn("__lead", lead(col("__ind"), 1).over(byRank))
    // per-rank term: the last rank seeds the recursion, every other
    // rank contributes the telescoped difference term
    val term = when(col("__j") === col("__n"),
      col("__ind").cast("double") / col("__n"))
      .otherwise((col("__ind") - col("__lead")) / lit(k.toDouble)
        * least(lit(k), col("__j")) / col("__j"))
    val suffix = Window.partitionBy(col("__tid")).orderBy(col("__j"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val sv = ranked
      .withColumn("__c", term.cast(DecimalType(30, 18)))
      .withColumn("__s", sum(col("__c")).over(suffix).cast("double"))
    sv.groupBy(col("__rid"))
      .agg(round(
        sum(col("__s").cast(DecimalType(30, 18))).cast("double")
          / count(lit(1)), 12).as("shapley"))
      .select(col("__rid").as(idCol), col("shapley"))
  }
}

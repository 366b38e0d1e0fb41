package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Domain-mixture sampling for training-data composition: down-sample a
  * multi-domain corpus so the retained rows match target mixture weights
  * (the data-mixing step of every large pretraining pipeline — The
  * Pile's per-source proportions, DoReMi-style reweighting — applied as
  * deterministic subset selection, no upsampling).
  *
  * Given weights w_d over domains, the retained total is the LARGEST
  * budget the corpus can serve without replication,
  * `N = min_d floor(count_d / w_d)`, and each domain keeps its first
  * `n_d = floor(w_d * N)` rows in a seeded content-hash order. The hash
  * is [[TextFunctions.md5Hash60]] of `"<id>:<seed>"` — a pure function
  * of row content (recomputed lineage reproduces identical membership,
  * unlike `rand(seed)`, which depends on partition layout) and
  * replayable by any engine with md5, so membership itself is
  * oracle-checkable.
  *
  * Scale shape: quotas come from a |domains|-row aggregate that stays
  * in-plan (broadcast back, no driver collect). The per-domain rank is
  * the same two-level salted rank as [[Split.stratified]] — rows are
  * range-bucketed by the top 6 bits of the 60-bit ordering hash, ranked
  * within (domain, bucket), and offset by the broadcast per-bucket
  * counts — so no single task ever sorts a whole domain (a corpus is
  * typically dominated by one web domain the way the fraud table is
  * dominated by one class).
  */
object Mixture {

  private val SaltShift = 54 // md5Hash60 is 60-bit non-negative; top 6 bits

  /** Content-stable Bernoulli sample: keep a row iff its seeded content
    * hash falls under `frac` of the hash space. `df.sample(frac, seed)`
    * is NOT this — its membership depends on partition layout and row
    * order, so a recomputed lineage (executor loss, AQE re-plan, a
    * retried stage) silently returns a DIFFERENT sample; on a real
    * cluster that is a correctness bug in any pipeline that reads the
    * sample twice. Hash membership is a pure function of (id, seed):
    * stable under recomputation, mergeable across incremental batches,
    * and replayable by any engine with md5 — so sampling is
    * oracle-checkable row by row. Sample size is Binomial(n, frac),
    * not exact-n (rank-based selection is [[sampleMixture]]'s job).
    */
  def sampleByHash(
      df: DataFrame, idCol: String, frac: Double, seed: Long): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1], got $frac")
    val h = TextFunctions.md5Hash60(
      concat(col(idCol).cast("string"), lit(":"), lit(seed.toString)))
    // 60-bit hash space: keep h < frac * 2^60, computed in exact longs
    df.filter(h < lit((frac * (1L << 60).toDouble).toLong))
  }

  /** Rows of `df` sampled to the target mixture; domains absent from
    * `weights` are dropped. Weights must be positive and are treated as
    * proportions (typically summing to 1).
    */
  def sampleMixture(
      df: DataFrame,
      domainCol: String,
      weights: Map[String, Double],
      idCol: String,
      seed: Long): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixture weights must be non-empty and positive")
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.sortBy(_._1).toDF(domainCol, "__w")
    val dfW = df.join(broadcast(wdf), Seq(domainCol))
    val counts = dfW.groupBy(col(domainCol))
      .agg(count(lit(1)).as("__cnt"), max(col("__w")).as("__wd"))
    val total = counts.agg(
      min(floor(col("__cnt") / col("__wd"))).cast("long").as("__N"))
    // floor(w_d * N) <= floor(w_d * count_d / w_d) = count_d: quotas are
    // always servable without replication
    val quotas = counts.crossJoin(broadcast(total))
      .select(col(domainCol),
        floor(col("__wd") * col("__N")).cast("long").as("__quota"))
    val hash = TextFunctions.md5Hash60(
      concat(col(idCol).cast("string"), lit(":" + seed)))
    val tagged0 = dfW
      .withColumn("__h", hash)
      .withColumn("__salt", shiftright(col("__h"), SaltShift))
    val wRank = Window.partitionBy(col(domainCol), col("__salt"))
      .orderBy(col("__h"), col(idCol))
    val wOff = Window.partitionBy(col(domainCol)).orderBy(col("__salt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = tagged0.groupBy(col(domainCol), col("__salt"))
      .agg(count(lit(1)).as("__bn"))
      .select(col(domainCol), col("__salt"),
        coalesce(sum(col("__bn")).over(wOff), lit(0L)).as("__off"))
    tagged0
      .join(broadcast(offsets), Seq(domainCol, "__salt"))
      .join(broadcast(quotas), Seq(domainCol))
      .withColumn("__rn", row_number().over(wRank) + col("__off"))
      .filter(col("__rn") <= col("__quota"))
      .select(df.columns.map(col): _*)
  }

  /** Token-budget mixture sampling — the same target-weights contract
    * as [[sampleMixture]] measured in TOKENS, which is how production
    * pretraining mixes actually specify composition (a domain's share
    * of the training budget is its token share, not its document
    * share). The total budget is the largest servable without
    * upsampling, `B = min_d floor(tokens_d / w_d)`; domain d keeps its
    * content-hash-ordered prefix of documents while the running
    * inclusive token sum stays within `floor(w_d * B)` (first-fit
    * prefix: a document that would cross the quota is dropped along
    * with everything after it in hash order — deterministic and
    * engine-replayable, no knapsack).
    *
    * Scale: identical two-level topology to [[sampleMixture]], with the
    * per-(domain, salt-bucket) window computing a running SUM instead
    * of a rank; per-bucket token offsets come from the broadcast
    * (domains × 64)-row aggregate, so the global running sum is
    * `within-bucket cumsum + offset` and no task ever scans a whole
    * domain.
    *
    * @param tokenCol precomputed per-row token count (e.g.
    *                 `size(TextFunctions.tokens(col))` or
    *                 [[TextAnalysis.bpeishTokenCount]])
    */
  def sampleByTokenBudget(
      df: DataFrame,
      domainCol: String,
      weights: Map[String, Double],
      tokenCol: String,
      idCol: String,
      seed: Long): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixture weights must be non-empty and positive")
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.sortBy(_._1).toDF(domainCol, "__w")
    val dfW = df.join(broadcast(wdf), Seq(domainCol))
    val totals = dfW.groupBy(col(domainCol))
      .agg(sum(col(tokenCol)).cast("long").as("__tok"), max(col("__w")).as("__wd"))
    val budget = totals.agg(
      min(floor(col("__tok") / col("__wd"))).cast("long").as("__B"))
    val quotas = totals.crossJoin(broadcast(budget))
      .select(col(domainCol),
        floor(col("__wd") * col("__B")).cast("long").as("__tq"))
    val hash = TextFunctions.md5Hash60(
      concat(col(idCol).cast("string"), lit(":" + seed)))
    val tagged0 = dfW
      .withColumn("__h", hash)
      .withColumn("__salt", shiftright(col("__h"), SaltShift))
    val wSum = Window.partitionBy(col(domainCol), col("__salt"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.partitionBy(col(domainCol)).orderBy(col("__salt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = tagged0.groupBy(col(domainCol), col("__salt"))
      .agg(sum(col(tokenCol)).cast("long").as("__bt"))
      .select(col(domainCol), col("__salt"),
        coalesce(sum(col("__bt")).over(wOff), lit(0L)).as("__off"))
    tagged0
      .join(broadcast(offsets), Seq(domainCol, "__salt"))
      .join(broadcast(quotas), Seq(domainCol))
      .withColumn("__cum",
        sum(col(tokenCol)).over(wSum).cast("long") + col("__off"))
      .filter(col("__cum") <= col("__tq"))
      .select(df.columns.map(col): _*)
  }

  /** Mixture audit: per-domain retained counts (the size contract). */
  def mixtureSummary(
      df: DataFrame,
      domainCol: String,
      weights: Map[String, Double],
      idCol: String,
      seed: Long): DataFrame =
    sampleMixture(df, domainCol, weights, idCol, seed)
      .groupBy(col(domainCol)).agg(count(lit(1)).as("n_sampled"))
      .orderBy(col(domainCol))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised categorical encodings and distribution-drift scoring —
  * the feature-engineering layer a fraud model sits on (reference: the
  * `transform_data.py` feature prep stops at one-hot; these are the
  * standard credit-risk/fraud extensions).
  *
  * Scale shape: every encoding is a hash aggregation to the category
  * (or category × fold) level followed by a join back on the category
  * key — never a per-row window. Category keys are shuffle-join keys,
  * so Zipf-skewed categories land where AQE skew-join splitting
  * applies. Counts stay integer until one final division; `ln` enters
  * only at the last step (harness queries round to 12 to absorb libm
  * tails).
  */
object Encoding {

  /** Weight-of-evidence table per category of `catCol`:
    * `woe = ln(((pos_c + 0.5)/P) / ((neg_c + 0.5)/N))` (half-count
    * smoothing — the standard guard for single-class categories) and
    * the category's information-value term
    * `iv_term = (pos_c/P − neg_c/N) · woe`. Σ iv_term over categories
    * is the feature's IV — the classic "is this feature worth binning
    * into the scorecard" statistic.
    */
  def woeIv(df: DataFrame, catCol: String, labelCol: String): DataFrame = {
    val perCat = df.groupBy(col(catCol))
      .agg(
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("pos_c"),
        sum(when(col(labelCol) === 1, 0L).otherwise(1L)).as("neg_c"))
    val tot = perCat.select(sum(col("pos_c")).as("__P"), sum(col("neg_c")).as("__N"))
    val woe = log(((col("pos_c") + lit(0.5)) / col("__P"))
      / ((col("neg_c") + lit(0.5)) / col("__N")))
    perCat.crossJoin(broadcast(tot))
      .select(col(catCol), col("pos_c"), col("neg_c"),
        woe.as("woe"),
        ((col("pos_c").cast("double") / col("__P")
          - col("neg_c").cast("double") / col("__N")) * woe).as("iv_term"))
  }

  /** Leakage-safe (out-of-fold) target encoding: each row's category
    * mean is computed EXCLUDING the row's own fold, so the encoding
    * never sees its own label — the difference between a useful feature
    * and a train-only mirage. Folds are the hash-membership folds of
    * [[Split.groupKFold]] on `idCol` (pure content function — a
    * recomputed lineage or an incremental batch folds identically).
    *
    * Returns the (category, fold) → encoding table (`enc` is constant
    * within a (category, fold) cell, so this IS the per-row encoding,
    * normalized): `catCol, fold, enc`. Cells whose out-of-fold slice is
    * empty (category present in one fold only) fall back to the global
    * out-of-fold prior. Join it back on (category, fold) to encode rows.
    *
    * Exactness: per-cell sums are decimal; the single division happens
    * per (category, fold) cell, not per row.
    */
  def targetEncodeOOF(
      df: DataFrame, catCol: String, labelCol: String, idCol: String,
      k: Int = 5, seed: Long = 42L): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val folded = Split.groupKFold(df, idCol, k, seed)
    val perCell = folded.groupBy(col(catCol), col("fold"))
      .agg(sum(col(labelCol).cast("decimal(28,6)")).as("__s"),
        count(lit(1)).as("__n"))
    val perCat = perCell.groupBy(col(catCol))
      .agg(sum(col("__s")).as("__cs"), sum(col("__n")).as("__cn"))
    val global = perCell.select(sum(col("__s")).as("__gs"), sum(col("__n")).as("__gn"))
    perCell
      .join(perCat, Seq(catCol))
      .crossJoin(broadcast(global))
      .select(col(catCol), col("fold"),
        // Cast both operands to double and divide ONCE in double: a
        // decimal-typed quotient collapses to DECIMAL(38,6) under
        // Spark's precision-loss rule (6 decimal digits), while the
        // oracle rounds a full double division to 12 — the sums are
        // integer-valued so decimal→double is exact and both engines
        // perform the same single correctly-rounded division.
        when(col("__cn") > col("__n"),
          (col("__cs") - col("__s")).cast("double")
            / (col("__cn") - col("__n")).cast("double"))
          .otherwise((col("__gs") - col("__s")).cast("double")
            / (col("__gn") - col("__n")).cast("double"))
          .as("enc"))
  }

  /** Population stability index between two slices of `df` (classic
    * drift monitor: expected = the reference slice, actual = the fresh
    * slice). `sliceCol` must be a 0/1 column (0 = expected, 1 =
    * actual). `valueCol` buckets into `bins` equal-width bins over
    * [lo, hi] (out-of-range clamps to the edge bins — drift past the
    * known range lands visibly in bin 0 / bins−1). Per bin:
    * smoothed shares `p_expected`/`p_actual` (half-count Laplace, so an
    * empty bin cannot produce ±∞) and
    * `psi_term = (p_actual − p_expected) · ln(p_actual / p_expected)`.
    * Σ psi_term is the PSI (rule of thumb: > 0.25 = investigate).
    */
  def psi(
      df: DataFrame, valueCol: String, sliceCol: String,
      lo: Double, hi: Double, bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val b = greatest(lit(0), least(lit(bins - 1),
      floor((col(valueCol) - lit(lo)) / lit((hi - lo) / bins)).cast("int")))
    val perBin = df.groupBy(b.as("bin"))
      .agg(
        sum(when(col(sliceCol) === 0, 1L).otherwise(0L)).as("n_expected"),
        sum(when(col(sliceCol) === 1, 1L).otherwise(0L)).as("n_actual"))
    val tot = perBin.select(sum(col("n_expected")).as("__E"),
      sum(col("n_actual")).as("__A"))
    val pe = (col("n_expected") + lit(0.5)) / (col("__E") + lit(0.5) * bins)
    val pa = (col("n_actual") + lit(0.5)) / (col("__A") + lit(0.5) * bins)
    perBin.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_expected"), col("n_actual"),
        pe.as("p_expected"), pa.as("p_actual"),
        ((pa - pe) * log(pa / pe)).as("psi_term"))
      .orderBy(col("bin"))
  }

  /** Bounded-metric drift distances over the same binning as [[psi]]:
    * Hellinger distance sqrt(1 − Σ sqrt(p_e·p_a)) and Jensen–Shannon
    * divergence ½·KL(p_e‖m) + ½·KL(p_a‖m) with m the midpoint — the
    * two drift scores that stay finite and bounded (Hellinger ≤ 1,
    * JS ≤ ln 2) where PSI explodes, so dashboards can threshold them
    * stably. Same half-count Laplace smoothing and edge-clamped
    * equal-width bins as [[psi]].
    *
    * Per-bin sqrt/ln terms round at 12 and accumulate in decimal
    * (order-independent); the final sqrt/halving is one double
    * expression. Output one row:
    * (n_expected, n_actual, bc, hellinger, js_nats).
    */
  def distributionDistances(
      df: DataFrame, valueCol: String, sliceCol: String,
      lo: Double, hi: Double, bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val b = greatest(lit(0), least(lit(bins - 1),
      floor((col(valueCol) - lit(lo)) / lit((hi - lo) / bins)).cast("int")))
    val perBin = df.groupBy(b.as("__b"))
      .agg(
        sum(when(col(sliceCol) === 0, 1L).otherwise(0L)).as("__ne"),
        sum(when(col(sliceCol) === 1, 1L).otherwise(0L)).as("__na"))
    val tot = perBin.select(sum(col("__ne")).as("__E"),
      sum(col("__na")).as("__A"))
    val pe = (col("__ne") + lit(0.5)) / (col("__E") + lit(0.5) * bins)
    val pa = (col("__na") + lit(0.5)) / (col("__A") + lit(0.5) * bins)
    val m = (pe + pa) / 2.0d
    def dec(c: Column): Column = round(c, 12).cast("decimal(38,12)")
    perBin.crossJoin(broadcast(tot))
      .select(col("__E"), col("__A"),
        dec(sqrt(pe * pa)).as("__bc"),
        dec(pe * log(pe / m) / 2.0d + pa * log(pa / m) / 2.0d).as("__js"))
      .groupBy(col("__E"), col("__A"))
      .agg(sum(col("__bc")).as("__sbc"), sum(col("__js")).as("__sjs"))
      .select(
        col("__E").as("n_expected"), col("__A").as("n_actual"),
        col("__sbc").cast("double").as("bc"),
        sqrt(greatest(lit(0.0d),
          lit(1.0d) - col("__sbc").cast("double"))).as("hellinger"),
        col("__sjs").cast("double").as("js_nats"))
  }

  /** Rank (quantile) normalization per group: each value maps to its
    * percent_rank within the group — the distribution-free feature
    * transform (rank-gauss without the gauss; monotone, outlier-
    * immune, identical scale across groups). Ties share a rank by
    * ordering on the VALUE alone, so equal inputs get equal outputs
    * regardless of partition order — the determinism ntile can't
    * give.
    *
    * Shape: one group-partitioned sort window; per-group volume is
    * the caller's skew concern (same contract as every per-key
    * window here).
    */
  def rankNormalize(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol))
    df.select(col(groupCol), col(valueCol))
      .withColumn("pr", percent_rank().over(w))
  }

  /** Beta-binomial empirical-Bayes shrinkage of per-entity event rates
    * (the "smoothed CTR": Robbins 1956 by way of every ads/fraud
    * ranking stack): fit Beta(α, β) to the population of per-entity
    * rates by method of moments, then shrink each entity toward the
    * prior — (c + α)/(n + α + β) — so low-volume entities stop
    * swinging between 0 and 1. When the rate variance exceeds the
    * binomial bound (no valid Beta), α and β fall back to 0 and the
    * raw rates pass through.
    *
    * Shape: one hash aggregate to (entity → c, n); the prior is a
    * ONE-ROW broadcast of decimal-folded moments; shrinkage is a pure
    * projection. Rates are ≤ 1 so the floor-snapped decimal moment
    * sums sit far below every precision hazard.
    */
  def ebShrinkRates(
      df: DataFrame, keyCol: String, convCol: Column): DataFrame = {
    val per = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(convCol.cast("long")).as("c"))
      .withColumn("rate", col("c").cast("double") / col("n").cast("double"))
    def snap12(c: Column): Column = floor(c * lit(1e12)) / lit(1e12)
    val moments = per.agg(
      count(lit(1)).as("__k"),
      sum(snap12(col("rate")).cast("decimal(38,12)")).cast("double")
        .as("__s"),
      sum(snap12(col("rate") * col("rate")).cast("decimal(38,12)"))
        .cast("double").as("__q"))
    val m = col("__s") / col("__k").cast("double")
    val v = col("__q") / col("__k").cast("double") - m * m
    val scale = m * (lit(1.0) - m) / v - lit(1.0)
    val prior = broadcast(moments.select(
      when(v > 0d && v < m * (lit(1.0) - m), snap12(m * scale))
        .otherwise(lit(0.0)).as("__alpha"),
      when(v > 0d && v < m * (lit(1.0) - m),
        snap12((lit(1.0) - m) * scale))
        .otherwise(lit(0.0)).as("__beta")))
    per.crossJoin(prior)
      .select(col(keyCol), col("n"), col("c"),
        snap12(col("rate")).as("rate"),
        snap12((col("c").cast("double") + col("__alpha"))
          / (col("n").cast("double") + col("__alpha") + col("__beta")))
          .as("shrunk_rate"),
        col("__alpha").as("alpha"), col("__beta").as("beta"))
  }
}

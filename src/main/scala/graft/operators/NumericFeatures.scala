package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric feature conditioning — the standard pre-model cleanups
  * applied after the reference's feature engineering (scaling lives in
  * [[graft.ml.FeaturePipeline]]; these are the distribution-shape
  * repairs that happen before any fitted scaler).
  *
  * Exactness discipline (the engine-wide parity rules): means/stds come
  * from decimal-accumulated sums (order-independent), percentiles from
  * the exact `percentile` aggregate, and corpus-level constants ride as
  * broadcast 1-row aggregates inside the lazy plan — composing these
  * into a pipeline never triggers an eager driver action.
  */
object NumericFeatures {

  private def dec(c: Column): Column = c.cast("decimal(30,8)")

  /** Winsorize: clamp `valueCol` into its exact [pLo, pHi] percentile
    * range (the outlier treatment that keeps rows — dropping tails
    * biases event data where the tail IS the signal). One exact
    * percentile aggregate (single buffer for both bounds) broadcasts
    * back over the data; the clamp is a pure projection.
    */
  def winsorize(
      df: DataFrame, valueCol: String,
      pLo: Double = 0.01, pHi: Double = 0.99,
      outCol: String = "winsorized"): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    val bounds = broadcast(df.agg(
      expr(s"percentile(`$valueCol`, array($pLo, $pHi))").as("__wb")))
    df.crossJoin(bounds)
      // least/greatest SKIP nulls (SQL semantics), so an unguarded clamp
      // would rewrite a NULL measurement into the upper bound — nulls
      // must stay null
      .withColumn(outCol,
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(greatest(col("__wb").getItem(0),
            least(col("__wb").getItem(1), col(valueCol).cast("double")))))
      .drop("__wb")
  }

  /** Tukey's IQR outlier filter: drop rows where `valueCol` falls
    * outside [q1 − k·IQR, q3 + k·IQR] (k = 1.5 is the classic fence).
    * The complement of [[winsorize]]: removal instead of capping, for
    * pipelines where an extreme row is evidence of corruption rather
    * than signal. Null values are KEPT (no evidence either way) — pair
    * with an impute/drop-null stage for null policy. Same plan shape:
    * one exact-percentile aggregate broadcast over the data.
    */
  def dropOutliersIqr(
      df: DataFrame, valueCol: String, k: Double = 1.5): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    val bounds = broadcast(df.agg(
      expr(s"percentile(`$valueCol`, array(0.25, 0.75))").as("__qb")))
    val q1 = col("__qb").getItem(0)
    val q3 = col("__qb").getItem(1)
    val iqr = q3 - q1
    val v = col(valueCol).cast("double")
    df.crossJoin(bounds)
      .filter(v.isNull ||
        (v >= q1 - lit(k) * iqr && v <= q3 + lit(k) * iqr))
      .drop("__qb")
  }

  /** Per-group z-score: (x − mean_g) / std_g with the group's sample
    * std (n−1), from decimal-exact sums. Groups with fewer than two
    * rows or zero variance yield null (division by zero/null), never
    * NaN/Infinity. One hash aggregate on the key, broadcast back —
    * group cardinality is what's small here, not the data.
    */
  def standardizeByKey(
      df: DataFrame, keyCol: String, valueCol: String,
      outCol: String = "zscore"): DataFrame = {
    val v = col(valueCol)
    // nullif: a single-row group has n-1 = 0, which ANSI mode turns
    // into a DIVIDE_BY_ZERO error instead of the intended null std.
    // The radicand is gated > 0 before sqrt: decimal rounding of v and
    // v*v is independent, so a zero-variance group of sub-precision
    // values can land an epsilon-NEGATIVE radicand, and sqrt(negative)
    // is NaN — which would leak through the nullif(std, 0) guard.
    val radicand = (sum(dec(v * v)).cast("double")
      - sum(dec(v)).cast("double") * sum(dec(v)).cast("double") / count(v)) /
      nullif((count(v) - lit(1)).cast("double"), lit(0.0))
    val stats = df.groupBy(col(keyCol)).agg(
      (sum(dec(v)).cast("double") / count(v)).as("__zmean"),
      when(radicand > 0.0, sqrt(radicand)).as("__zstd"))
    // null-safe key equality: groupBy treats NULL as a real group, so
    // the join back must too — a plain equi-join would silently DROP
    // every null-key row from the returned frame
    df.join(broadcast(stats.withColumnRenamed(keyCol, "__zk")),
        col(keyCol) <=> col("__zk"))
      .withColumn(outCol, (v - col("__zmean")) / col("__zstd"))
      .drop("__zk", "__zmean", "__zstd")
  }

  /** Per-group robust scaling: (x − median_g) / IQR_g — the
    * outlier-insensitive cousin of [[standardizeByKey]] (a single
    * extreme value shifts a mean/std z-score arbitrarily but barely
    * moves median/IQR; for fraud amounts and other heavy-tailed
    * features this is the scaling that survives contact with real
    * data). EXACT interpolated percentiles (the [[Eda.percentileBands]]
    * parity: Spark `percentile` ≡ DuckDB `quantile_cont`); groups with
    * zero IQR yield null (nullif guard), never Infinity.
    *
    * Shape: one hash aggregate per group for the three quantiles,
    * broadcast back on a null-safe key — group cardinality is what's
    * small, not the data. Exact per-group percentile buffers one
    * GROUP's values (the audit-path contract); swap percentile_approx
    * in for dashboard-grade numbers at extreme group sizes.
    */
  def robustScaleByKey(
      df: DataFrame, keyCol: String, valueCol: String,
      outCol: String = "rscaled"): DataFrame = {
    val stats = df.groupBy(col(keyCol)).agg(
      expr(s"percentile(`$valueCol`, array(0.25, 0.5, 0.75))").as("__q"))
      .select(col(keyCol).as("__rk"),
        col("__q").getItem(1).as("__med"),
        nullif(col("__q").getItem(2) - col("__q").getItem(0), lit(0.0))
          .as("__iqr"))
    df.join(broadcast(stats), col(keyCol) <=> col("__rk"))
      .withColumn(outCol,
        (col(valueCol).cast("double") - col("__med")) / col("__iqr"))
      .drop("__rk", "__med", "__iqr")
  }

  /** Mergeable moment sketches: per slice the exact (n, sum, sum-sq)
    * triple in decimal, then the SAME triples re-aggregated into a
    * global row — the associative-merge discipline every distributed
    * statistic needs (per-partition partials, per-slice rollups,
    * cross-day incremental updates all merge this way; contrast a
    * stored per-slice variance, which cannot be merged). Output: one
    * row per slice plus an `__all` row whose mean/variance are
    * ASSEMBLED FROM THE MERGED TRIPLES, never recomputed from raw
    * data — the merge IS the algorithm under test.
    */
  def mergeableMoments(
      df: DataFrame, sliceCol: String, valueCol: String): DataFrame = {
    val per = df.groupBy(col(sliceCol).cast("string").as("slice"))
      .agg(count(col(valueCol)).as("n"),
        sum(col(valueCol).cast("decimal(28,6)")).as("__s"),
        sum(col(valueCol).cast("decimal(19,6)")
          * col(valueCol).cast("decimal(19,6)")).as("__ss"))
    val merged = per.select(lit("__all").as("slice"),
      sum(col("n")).as("n"), sum(col("__s")).as("__s"),
      sum(col("__ss")).as("__ss"))
    def finish(t: DataFrame): DataFrame = t.select(
      col("slice"), col("n"),
      // 10/8 decimals, not 12: variance magnitude ~1e3-1e4 would push
      // round-12 past double precision (16+ sig figs), where the two
      // engines' rounding of the same double legitimately differs
      round(col("__s").cast("double") / col("n"), 10).as("mean"),
      round(
        col("__ss").cast("double") / col("n")
          - (col("__s").cast("double") / col("n"))
            * (col("__s").cast("double") / col("n")), 8).as("variance"))
    finish(per).unionByName(finish(merged))
  }

  /** Per-group trimmed mean: the mean of values inside the group's
    * exact [pLo, pHi] percentile band — the robust location estimate
    * for heavy-tailed metrics (a handful of whale transactions move a
    * raw mean arbitrarily; they can't enter a trimmed one). One
    * exact-percentile aggregate per group (broadcast back on a
    * null-safe key), one conditional decimal-sum pass. Output per
    * group: n_total, n_kept, trimmed_mean, raw_mean.
    */
  def trimmedMeanByKey(
      df: DataFrame, keyCol: String, valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    val v = col(valueCol).cast("double")
    val bounds = df.groupBy(col(keyCol)).agg(
      expr(s"percentile(`$valueCol`, array($pLo, $pHi))").as("__tb"))
      .select(col(keyCol).as("__tk"),
        col("__tb").getItem(0).as("__lo"), col("__tb").getItem(1).as("__hi"))
    df.join(broadcast(bounds), col(keyCol) <=> col("__tk"))
      .groupBy(col(keyCol))
      .agg(
        count(v).as("n_total"),
        sum(when(v >= col("__lo") && v <= col("__hi"), 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(v >= col("__lo") && v <= col("__hi"),
          v.cast("decimal(28,6)"))).as("__ts"),
        sum(v.cast("decimal(28,6)")).as("__rs"))
      .select(col(keyCol), col("n_total"), col("n_kept"),
        round(col("__ts").cast("double") / col("n_kept"), 12)
          .as("trimmed_mean"),
        round(col("__rs").cast("double") / col("n_total"), 12).as("raw_mean"))
  }

  /** Hill estimator of the power-law tail index over the top-k order
    * statistics: alpha = k / Σ_{i=1..k} ln(x_i / x_(k+1)) — "how heavy
    * is this tail" (alpha < 2: infinite variance; the skew-mitigation
    * planner's early warning, companion to the Zipf fit and the degree
    * histogram).
    *
    * Shape: one global top-(k+1) (TakeOrdered — per-partition heaps,
    * never a sort), then all arithmetic on k+1 rows. The ln terms
    * round at 12 and accumulate in decimal. Output one row:
    * (k, x_kplus1, alpha).
    */
  def hillTailIndex(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val top = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(col(valueCol).cast("double").as("__v"))
      .orderBy(col("__v").desc)
      .limit(k + 1)
    // k+1 rows from here on: the unpartitioned window is benign
    val w = Window.orderBy(col("__v").desc)
    val ranked = top.withColumn("__r", row_number().over(w))
    val xk1 = ranked.where(col("__r") === k + 1)
      .select(col("__v").as("__xk1"))
    ranked.where(col("__r") <= k)
      .crossJoin(broadcast(xk1))
      .select(col("__xk1"),
        round(log(col("__v") / col("__xk1")), 12)
          .cast("decimal(38,12)").as("__t"))
      .groupBy(col("__xk1"))
      .agg(sum(col("__t")).as("__s"))
      .select(lit(k.toLong).as("k"), col("__xk1").as("x_kplus1"),
        (lit(k.toDouble) / col("__s").cast("double")).as("alpha"))
  }

  /** Per-group Value-at-Risk and conditional VaR (expected
    * shortfall): the exact interpolated q-quantile (`percentile` ≡
    * `quantile_cont`) and the mean of the values AT OR ABOVE it —
    * "when we're in the worst (1-q) tail, how bad is it on average".
    * Tail means divide exact decimal sums once in double.
    *
    * Output: (groupCol, n, var_q, n_tail, cvar), ordered by group.
    */
  def cvarByGroup(
      df: DataFrame, groupCol: String, valueCol: String,
      q: Double = 0.95): DataFrame = {
    require(q > 0 && q < 1, s"q must be in (0,1), got $q")
    val v = col(valueCol).cast("double")
    val cuts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        expr(s"percentile($valueCol, ${q}d)").as("var_q"))
    df.filter(col(valueCol).isNotNull)
      .join(broadcast(cuts), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        max(col("n")).as("n"),
        max(col("var_q")).as("var_q"),
        sum(when(v >= col("var_q"), 1L).otherwise(0L)).as("n_tail"),
        (sum(when(v >= col("var_q"), dec(v))).cast("double")
          / sum(when(v >= col("var_q"), 1L).otherwise(0L)).cast("double"))
          .as("cvar"))
      .orderBy(col(groupCol))
  }

  /** Cross-source quantile normalization (batch-effect correction):
    * each value is replaced by the value at the same quantile of the
    * GLOBAL distribution, so every source ends up with the same
    * marginal — the fix when one source's scores run systematically
    * hot and a shared threshold would over-select it.
    *
    * Values are first snapped to a `gridDecimals` grid: that bounds
    * the distinct-value table, which is the whole scale design — the
    * global ECDF over distinct grid values is grid-bounded (NOT
    * n-bounded, as raw continuous doubles would be), so it broadcasts,
    * and the quantile lookup is a broadcast interval join instead of a
    * global sort. Per-source quantiles come from `percent_rank` inside
    * each source partition (ties share a rank, so the map is
    * deterministic); the target index floor(pr*(N-1)+0.5) uses
    * explicit floor-plus-half, identical rounding in any engine.
    */
  def quantileNormalize(
      df: DataFrame, sourceCol: String, valueCol: String,
      gridDecimals: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // explicit floor(x*m + 0.5)/m, not round(): round-half modes differ
    // across engines at exact decimal-half doubles; this is one IEEE
    // expression with one answer everywhere
    val mult = math.pow(10.0, gridDecimals)
    val g = floor(col(valueCol).cast("double") * mult + 0.5) / mult
    val snapped = df.withColumn("__g", g)
    // global ECDF over distinct grid values: [cs, ce) index intervals
    val wv = Window.orderBy(col("__g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = snapped.groupBy(col("__g")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__ce", sum(col("__cnt")).over(wv))
      .select(col("__g").as("__tv"), (col("__ce") - col("__cnt")).as("__cs"),
        col("__ce"))
    val total = snapped.agg(count(lit(1)).as("__n"))
    val ranked = snapped
      .withColumn("__pr", percent_rank().over(
        Window.partitionBy(col(sourceCol)).orderBy(col("__g"))))
      .crossJoin(broadcast(total))
      .withColumn("__k",
        floor(col("__pr") * (col("__n") - 1) + 0.5).cast("long"))
    // interval-containment lookup on DISTINCT target indexes only: the
    // nested-loop comparisons run |distinct k| x |grid| (both bounded),
    // and the corpus-sized side re-attaches through a broadcast hash
    // equi-join — the direct row-level interval join measured ~10 s at
    // sf0.1 (600k rows x grid BNLJ) and grows multiplicatively with n
    val kv = ranked.select(col("__k")).distinct()
      .join(broadcast(cum),
        col("__k") >= col("__cs") && col("__k") < col("__ce"))
      .select(col("__k").as("__k2"), col("__tv"))
    ranked
      .join(broadcast(kv), col("__k") === col("__k2"))
      .withColumn("norm_value", col("__tv"))
      .drop("__g", "__pr", "__n", "__k", "__k2", "__tv")
  }
}

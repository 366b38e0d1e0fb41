package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based two-sample and correlation statistics — the
  * distribution-free drift tests (Mann-Whitney U, Spearman's rho)
  * that back data-quality monitors when values are heavy-tailed and
  * means lie.
  *
  * Scale design: NO global rank window anywhere. Average ranks come
  * from the distinct-value cumulative table (value, cum_start,
  * cum_end): every row of a distinct value v has average rank
  * (cs + ce + 1)/2, so rank SUMS reduce to per-distinct-value
  * integer products — two hash aggregates and a broadcast join,
  * shuffles bounded by |distinct values|, not n. Doubling (2R) keeps
  * every intermediate an exact integer in decimal; the only doubles
  * are the final z / rho expressions.
  */
object RankStats {

  /** The distinct-value rank table: (v, cnt, twice_avg_rank) where
    * twice_avg_rank = cs + ce + 1 is an exact integer (2x the average
    * rank of the tied block). The running sum over the distinct-value
    * order is the one ordered window, bounded by |distinct values|.
    */
  private def rankTable(df: DataFrame, v: Column): DataFrame = {
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(v.as("__v")).where(col("__v").isNotNull)
      .groupBy(col("__v")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__ce", sum(col("__cnt")).over(w))
      .select(col("__v"),
        ((col("__ce") - col("__cnt")) + col("__ce") + 1).as("__r2"))
  }

  /** Mann-Whitney U (two-sided normal approximation, average ranks
    * for ties; the variance term is the untied formula — documented,
    * and identical in the oracle). `sliceCol` must have exactly two
    * values; slices are ordered by their string form, the first is
    * "group 1". Output one row:
    * n1, n2, u1, u2, z (z rounded at 9 — |z| can reach ~1e2, and the
    * sqrt denominator is irrational, so 12 would chase ulps).
    */
  def mannWhitney(
      df: DataFrame, sliceCol: String, valueCol: String): DataFrame = {
    val ranks = rankTable(df, col(valueCol).cast("double"))
    val r2sums = df
      .select(col(sliceCol).cast("string").as("__s"),
        col(valueCol).cast("double").as("__v"))
      .where(col("__v").isNotNull)
      .join(broadcast(ranks), Seq("__v"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__r2").cast("decimal(38,0)")).as("__2r"))
    val wide = r2sums
      .select(
        min(struct(col("__s"), col("__n"), col("__2r"))).as("a"),
        max(struct(col("__s"), col("__n"), col("__2r"))).as("b"))
      .select(
        col("a.__n").as("n1"), col("b.__n").as("n2"),
        col("a.__2r").as("__2r1"))
    // 2*U1 = 2*R1 - n1*(n1+1); keep everything doubled-integer exact
    wide
      .withColumn("__2u1",
        col("__2r1") - (col("n1").cast("decimal(38,0)") * (col("n1") + 1)))
      .withColumn("__2u2",
        lit(2).cast("decimal(38,0)") * col("n1") * col("n2") - col("__2u1"))
      .select(col("n1"), col("n2"),
        (col("__2u1").cast("double") / 2).as("u1"),
        (col("__2u2").cast("double") / 2).as("u2"),
        round(
          (col("__2u1").cast("double") / 2
            - col("n1").cast("double") * col("n2").cast("double") / 2)
            / sqrt(col("n1").cast("double") * col("n2").cast("double")
              * (col("n1").cast("double") + col("n2").cast("double") + 1)
              / 12), 9).as("z"))
  }

  /** Spearman's rho between two numeric columns, with average ranks
    * for ties: Pearson on the doubled ranks (2r is integer-exact, and
    * rho is scale-invariant, so doubling changes nothing). All sums
    * are exact decimal; rho is one double expression, rounded at 9.
    */
  def spearman(
      df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.select(col(xCol).cast("double").as("__x"),
      col(yCol).cast("double").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    val rx = rankTable(base, col("__x"))
      .select(col("__v").as("__x"), col("__r2").as("__rx"))
    val ry = rankTable(base, col("__y"))
      .select(col("__v").as("__y"), col("__r2").as("__ry"))
    val joined = base
      .join(broadcast(rx), Seq("__x"))
      .join(broadcast(ry), Seq("__y"))
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    val agg = joined.agg(
      count(lit(1)).as("n"),
      sum(d38(col("__rx"))).as("sx"),
      sum(d38(col("__ry"))).as("sy"),
      sum(d38(col("__rx")) * d38(col("__ry")).cast("decimal(19,0)")).as("sxy"),
      sum(d38(col("__rx")) * d38(col("__rx")).cast("decimal(19,0)")).as("sxx"),
      sum(d38(col("__ry")) * d38(col("__ry")).cast("decimal(19,0)")).as("syy"))
    agg.select(col("n"),
      round(
        (col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double")
            / col("n"))
          / sqrt(
            (col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")
                / col("n"))
              * (col("syy").cast("double")
                - col("sy").cast("double") * col("sy").cast("double")
                  / col("n"))), 9).as("rho"))
  }

  /** Per-group weighted (lower) median: the smallest value v whose
    * cumulative weight reaches half the group's total —
    * min { v : 2·W(≤v) >= W } — the robust center when rows carry
    * unequal mass (line value weighted by quantity, doc stats by
    * tokens). The comparison runs entirely in exact decimal (2·cumw
    * vs W), so there is no interpolation and no float threshold to
    * disagree on.
    *
    * Shape: one hash aggregate onto (group, distinct value); the
    * per-group cumulative window is bounded by distinct values per
    * group (the [[rankTable]] discipline); a broadcast of per-group
    * totals; one min-aggregate. Output: (groupCol, n, total_weight,
    * weighted_median), ordered by group.
    */
  def weightedMedianByGroup(
      df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String): DataFrame = {
    val w = col(weightCol).cast("decimal(18,6)")
    val per = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"), sum(w).as("__w"))
    val win = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = per.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("__n"),
        // NOT "__W": Spark resolves column names case-insensitively by
        // default, so it would collide with per's "__w" after the join
        sum(col("__w")).cast("decimal(28,6)").as("__tw"))
    per
      .withColumn("__cw", sum(col("__w")).over(win).cast("decimal(28,6)"))
      .join(broadcast(tot), Seq(groupCol))
      .where(col("__cw") * 2 >= col("__tw"))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"),
        max(col("__tw")).cast("double").as("total_weight"),
        min(col("__v")).as("weighted_median"))
      .orderBy(col(groupCol))
  }

  /** Wilcoxon signed-rank test over paired differences — the paired
    * companion to [[mannWhitney]]: rank |d| ascending with AVERAGE
    * ranks for ties, W+ = Σ ranks of positive differences, and the
    * tie-corrected normal approximation
    * z = (W+ − n(n+1)/4) / sqrt(n(n+1)(2n+1)/24 − Σ(t³−t)/48).
    * Zero differences drop (the standard Wilcoxon reduction).
    *
    * Shape: one rank window over the differences (data-sized but
    * single-axis — the same global-order contract as every rank
    * statistic here), one tie aggregate keyed by |d|, one final
    * one-row reduce. Average ranks are exact halves, summed in
    * DECIMAL; n, tie counts, and the variance pieces are integers,
    * so only the final z division is floating.
    *
    * Output one row: (n_pairs, w_plus, z), z floor-snapped 1e9.
    */
  def wilcoxonSignedRank(pairs: DataFrame, diffCol: String): DataFrame = {
    val base = pairs
      .select(col(diffCol).cast("double").as("__d"))
      .filter(col("__d").isNotNull && col("__d") =!= 0.0)
      .withColumn("__ad", abs(col("__d")))
    val w = Window.orderBy(col("__ad"))
    val ranked = base
      .withColumn("__rmin", rank().over(w))
      .withColumn("__c", count(lit(1)).over(Window.partitionBy(col("__ad"))))
      // average rank of a tie group = min rank + (c-1)/2 — an exact
      // half-integer
      .withColumn("__avgr",
        col("__rmin").cast("double")
          + (col("__c") - 1).cast("double") / lit(2.0))
    val ties = base.groupBy(col("__ad"))
      .agg(count(lit(1)).as("__t"))
      .agg(sum(col("__t") * col("__t") * col("__t") - col("__t"))
        .as("__tcorr"))
    val agg = ranked.agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("__d") > 0, col("__avgr").cast("decimal(20,1)"))
        .otherwise(lit(0.0).cast("decimal(20,1)"))).as("__wp"))
    agg.crossJoin(broadcast(ties))
      .select(col("n_pairs"),
        col("__wp").cast("double").as("w_plus"),
        (floor(
          (col("__wp").cast("double")
            - col("n_pairs").cast("double") * (col("n_pairs") + 1).cast("double") / lit(4.0))
            / sqrt(
              col("n_pairs").cast("double") * (col("n_pairs") + 1).cast("double")
                * (lit(2L) * col("n_pairs") + 1).cast("double") / lit(24.0)
                - col("__tcorr").cast("double") / lit(48.0))
            * 1e9) / 1e9).as("z"))
  }

  /** Cohen's kappa between two binary raters: chance-corrected
    * agreement (po − pe)/(1 − pe) from the four integer confusion
    * cells of ONE conditional aggregate — the label-quality audit for
    * double-annotated data. Output one row:
    * (n, po, pe, kappa), each floor-snapped at 1e9.
    */
  /** Robust per-group outlier audit on the median absolute deviation:
    * med = the LOWER median (value at rank ceil(n/2) — deterministic
    * for any tie structure, no mid-point averaging to drift across
    * engines), mad = lower median of |v - med|, outlier iff
    * |v - med| > k * mad (with mad = 0 every nonzero deviation flags —
    * the standard hazard, kept deliberately). The z-score's robust
    * replacement for heavy-tailed metrics where mean/stddev are
    * themselves dragged by the outliers being hunted.
    *
    * Scale shape: two rank passes (window per group) + one hash
    * aggregate; at extreme per-group cardinality swap the exact rank
    * for [[graft.operators.Sketches.histogramQuantiles]]'s bounded-
    * state estimate — same dataflow, sketch-backed median.
    */
  def madOutliers(
      df: DataFrame, groupCol: String, valCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val base = df.where(col(valCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valCol).cast("double").as("__v"))
    def lowerMedian(d: DataFrame, vc: String, out: String): DataFrame =
      d.withColumn("__rk", row_number().over(
          Window.partitionBy(col("__g")).orderBy(col(vc))))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__g"))))
        .filter(col("__rk") === ceil(col("__n").cast("double") / 2.0))
        .select(col("__g"), col(vc).as(out))
    val med = lowerMedian(base, "__v", "median")
    val dev = base.join(med, Seq("__g"))
      .withColumn("__d", abs(col("__v") - col("median")))
    val mad = lowerMedian(dev.select(col("__g"), col("__d")), "__d", "mad")
    dev.join(mad, Seq("__g"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"),
        min(col("median")).as("median"),
        min(col("mad")).as("mad"),
        sum(when(col("__d") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .withColumnRenamed("__g", groupCol)
  }

  def cohensKappa(df: DataFrame, rater1: Column, rater2: Column): DataFrame = {
    val cells = df.agg(
      sum(when(rater1 && rater2, 1L).otherwise(0L)).as("__a"),
      sum(when(rater1 && !rater2, 1L).otherwise(0L)).as("__b"),
      sum(when(!rater1 && rater2, 1L).otherwise(0L)).as("__c"),
      sum(when(!rater1 && !rater2, 1L).otherwise(0L)).as("__d"))
      .withColumn("__n", col("__a") + col("__b") + col("__c") + col("__d"))
    val nd = col("__n").cast("double")
    val po = (col("__a") + col("__d")).cast("double") / nd
    val pe = ((col("__a") + col("__b")).cast("double") *
      (col("__a") + col("__c")).cast("double") +
      (col("__c") + col("__d")).cast("double") *
        (col("__b") + col("__d")).cast("double")) / (nd * nd)
    cells.select(col("__n").as("n"),
      (floor(po * 1e9) / 1e9).as("po"),
      (floor(pe * 1e9) / 1e9).as("pe"),
      (floor((po - pe) / (lit(1.0) - pe) * 1e9) / 1e9).as("kappa"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concentration / inequality statistics — "how skewed is this
  * distribution" answers (revenue concentration per segment, token
  * budget concentration per source) that complement the EDA surface's
  * moments ([[Eda]]) and the drift tests ([[RankStats]]).
  *
  * Scale design: the rank-weighted sums that define the Gini
  * coefficient reduce to the per-group DISTINCT-VALUE cumulative table
  * (the [[RankStats]] discipline): a tied block of value v with count c
  * and cl predecessors contributes v*(c*cl + c*(c+1)/2) to
  * sum_i(i*x_i), so the per-group window is bounded by distinct values
  * per group, never raw rows. All rank arithmetic is exact
  * integer-in-decimal; the value enters as decimal(18,6); one double
  * division at the end.
  */
object Inequality {

  /** Per-group Gini coefficient over a non-negative value column:
    * G = (2*sum_i i*x_i - (n+1)*sum x) / (n * sum x) with x sorted
    * ascending within the group, ranks 1..n, ties resolved by the
    * closed-form tied-block rank sum (equivalent to ANY row_number
    * assignment among equal values — equal values make the sum
    * invariant to tie order).
    *
    * Output: (groupCol, n, total, gini), one row per group, ordered by
    * group. Groups with zero total yield null gini (0/0), never NaN.
    */
  def giniByGroup(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("decimal(18,6)")
    val per = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), v.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    per
      .withColumn("__cl", coalesce(sum(col("__c")).over(w), lit(0L)))
      // tied-block rank sum: ranks cl+1 .. cl+c sum to c*cl + c(c+1)/2
      // (exact integers; *2 keeps the halved term integral)
      .withColumn("__2ranksum",
        (lit(2).cast("decimal(38,0)") * col("__c") * col("__cl")
          + col("__c").cast("decimal(38,0)") * (col("__c") + 1)))
      .groupBy(col("__g"))
      .agg(
        sum(col("__c")).as("__n"),
        sum(col("__v") * col("__c").cast("decimal(18,0)"))
          .cast("decimal(28,6)").as("__sum"),
        // v * 2*ranksum: decimal(18,6) x decimal(20,0)-ish — cast the
        // rank sum down to what the data can actually hold so the
        // product stays inside both engines' 38-digit width
        sum(col("__v") * col("__2ranksum").cast("decimal(20,0)"))
          .as("__2ixsum"))
      .select(
        col("__g").as(groupCol),
        col("__n").as("n"),
        col("__sum").cast("double").as("total"),
        // G = (2*sum(i*x) - (n+1)*sum x) / (n*sum x); numerator uses
        // the doubled rank sum so everything stays integral-in-decimal
        // (n+1) at decimal(10,0): x decimal(28,6) keeps the product at
        // width 38 (DuckDB errors past 38; Spark precision-losses)
        ((col("__2ixsum") - (col("__n") + 1).cast("decimal(10,0)")
          * col("__sum")).cast("double")
          / (col("__n").cast("decimal(10,0)") * col("__sum"))
            .cast("double")).as("gini"))
      .orderBy(col(groupCol))
  }

  /** Lorenz curve sampled at decile boundaries — the curve BEHIND
    * [[giniByGroup]]'s scalar: for each population decile d/10, the
    * cumulative share of total value held by the bottom d/10 of rows
    * (sorted by value ascending). Same bounded-domain shape as the
    * Gini: one hash aggregate onto DISTINCT values, one cumulative
    * window over that bounded domain, then each decile selects its
    * first crossing row by an exact INTEGER comparison
    * (cl·deciles >= d·n — no floating thresholds to straddle).
    *
    * Output: (decile, pop_share, value_share), `deciles` rows,
    * shares floor-snapped at 1e9. The last row is always (1, 1).
    */
  def lorenzCurve(
      df: DataFrame, valueCol: String, deciles: Int = 10): DataFrame = {
    require(deciles >= 1, s"deciles must be >= 1, got $deciles")
    val v = col(valueCol).cast("decimal(18,6)")
    val per = df
      .filter(col(valueCol).isNotNull && col(valueCol) >= 0)
      .groupBy(v.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = per
      .withColumn("__cl", sum(col("__c")).over(w))
      .withColumn("__sv",
        sum(col("__v") * col("__c").cast("decimal(18,0)")).over(w)
          .cast("decimal(28,6)"))
    val tot = per.agg(
      sum(col("__c")).as("__n"),
      sum(col("__v") * col("__c").cast("decimal(18,0)"))
        .cast("decimal(28,6)").as("__s"))
    val decs = df.sparkSession.range(1, deciles + 1L)
      .select(col("id").as("__d"))
    val sel = cum.crossJoin(broadcast(tot))
      .join(broadcast(decs),
        col("__cl") * lit(deciles.toLong) >= col("__d") * col("__n"))
      .groupBy(col("__d"))
      .agg(min(col("__cl")).as("__cl"))
    sel
      .join(cum.select(col("__cl"), col("__sv")), Seq("__cl"))
      .crossJoin(broadcast(tot))
      .select(col("__d").cast("int").as("decile"),
        (floor(col("__cl").cast("double") / col("__n").cast("double")
          * 1e9) / 1e9).as("pop_share"),
        (floor(col("__sv").cast("double") / col("__s").cast("double")
          * 1e9) / 1e9).as("value_share"))
      .orderBy(col("decile"))
  }

  /** Herfindahl–Hirschman concentration index per market: with
    * member totals x_i and market total X, HHI = Σ(x_i/X)² = Σx_i²/X²
    * — the algebraic collapse means NO per-member share computation:
    * two exact decimal aggregates (member totals, then per-market
    * Σx and Σx²) and one final double division. 1/n_members is the
    * perfectly-competitive floor, 1 the monopoly ceiling.
    *
    * Output per market: (marketCol, n_members, total, hhi), hhi
    * floor-snapped at 1e9.
    */
  def herfindahl(
      df: DataFrame, marketCol: String, memberCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("decimal(18,6)")
    val member = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(marketCol).as("__m"), col(memberCol).as("__i"))
      .agg(sum(v).cast("decimal(28,6)").as("__x"))
    member
      .groupBy(col("__m"))
      .agg(
        count(lit(1)).as("n_members"),
        sum(col("__x")).cast("decimal(28,6)").as("__sum"),
        // x up to decimal(28,6) squares past 38 digits; re-narrowed
        // operands keep the product in-width — one side at (19,6)
        // because DuckDB multiplies two width-18 decimals in int64
        // and overflows (width 19 forces its int128 path)
        sum((col("__x").cast("decimal(19,6)")
          * col("__x").cast("decimal(18,6)")).cast("decimal(38,12)"))
          .as("__sumsq"))
      .select(col("__m").as(marketCol), col("n_members"),
        col("__sum").cast("double").as("total"),
        (floor(col("__sumsq").cast("double")
          / (col("__sum").cast("double") * col("__sum").cast("double"))
          * 1e9) / 1e9).as("hhi"))
      .orderBy(col(marketCol))
  }
}

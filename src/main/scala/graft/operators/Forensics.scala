package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Numeric-forensics audits over transaction amounts — the classic
  * fraud-analytics tells (Nigrini's digit analysis): fabricated
  * numbers don't follow Benford's law and over-prefer round amounts.
  * Reference scope: the reference pipeline flags fraud by supervised
  * features; these are the unsupervised screening audits an analyst
  * runs FIRST on a new amount column.
  *
  * Cross-engine discipline: amounts are lifted to integer cents with
  * one `round(value·100)` (deterministic on both engines away from
  * exact .5 ties, which 2-decimal money cannot hit), the leading
  * digit comes from the cents INTEGER's string form (scale-invariant
  * under the ·100 lift), Benford expectations use the one shared
  * `ln((d+1)/d)/ln(10)` expression, and the chi-square sum
  * accumulates per-digit terms in DECIMAL so partition order can
  * never wobble the statistic.
  */
object Forensics {

  /** Benford first-digit audit per group: the observed leading-digit
    * distribution of positive amounts against Benford's
    * p(d) = log10(1 + 1/d), with the group's chi-square statistic
    * (9-term, zero-observation digits included at expectation). One
    * row per (group, digit 1..9) — complete by construction via a
    * broadcast digit frame. Output: (groupCol, digit, n_obs,
    * benford_p floored at 1e-12, chi2 floored at 1e-6, repeated per
    * digit row). Null, non-positive, and sub-cent amounts (cents < 1
    * after the ·100 lift) are excluded — they have no leading
    * significant digit, and counting them in group totals but not in
    * digit cells would bias the chi-square.
    *
    * Shape: one filter + hash aggregate per (group, digit), a
    * broadcast 9-row frame join, and a 9-row window sum per group —
    * group-parallel at any scale.
    */
  def benfordDigitAudit(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val cents = round(col(valueCol) * 100).cast("long")
    // Gate on cents >= 1, not value > 0: a positive amount below 0.005
    // rounds to cents=0, whose "leading digit" 0 would enter the group
    // total but never a 1..9 digit cell — the chi-square expectations
    // would then sum to more than the observed cells.
    val base = df
      .filter(col(valueCol).isNotNull && cents >= 1)
      .select(col(groupCol),
        substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
    val obs = base.groupBy(col(groupCol), col("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val totals = base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
    val digits = spark.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val p = log((col("digit").cast("double") + 1.0)
      / col("digit").cast("double")) / log(lit(10.0))
    val diff = (col("n_obs").cast("double")
      - col("__n").cast("double") * col("__p"))
    totals.crossJoin(broadcast(digits))
      .join(obs, Seq(groupCol, "digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("__p", p)
      .withColumn("__term",
        (diff * diff / (col("__n").cast("double") * col("__p")))
          .cast("decimal(30,15)"))
      .withColumn("chi2",
        floor(sum(col("__term"))
          .over(Window.partitionBy(col(groupCol))).cast("double") * 1e6)
          / 1e6)
      .select(col(groupCol), col("digit"), col("n_obs"),
        (floor(col("__p") * 1e12) / 1e12).as("benford_p"), col("chi2"))
  }

  /** Round-amount bias per group: the share of positive amounts that
    * are exact whole units (cents % 100 = 0) and exact ten-unit
    * multiples (cents % 1000 = 0) — fabricated amounts over-select
    * both. All-integer counts, one final division. Output:
    * (groupCol, n_amounts, n_whole, n_tens, whole_share, tens_share —
    * shares floored at 1e-9).
    */
  def roundAmountBias(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100).cast("long")
    df.filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(col(groupCol), cents.as("__c"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_amounts"),
        sum(when(pmod(col("__c"), lit(100L)) === 0, 1L).otherwise(0L))
          .as("n_whole"),
        sum(when(pmod(col("__c"), lit(1000L)) === 0, 1L).otherwise(0L))
          .as("n_tens"))
      .select(col(groupCol), col("n_amounts"), col("n_whole"),
        col("n_tens"),
        (floor(col("n_whole").cast("double")
          / col("n_amounts").cast("double") * 1e9) / 1e9)
          .as("whole_share"),
        (floor(col("n_tens").cast("double")
          / col("n_amounts").cast("double") * 1e9) / 1e9)
          .as("tens_share"))
  }
}

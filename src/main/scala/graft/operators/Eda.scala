package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EDA aggregation surface (reference `src/processor.py:21-54`):
  * describe, value_counts, grouped means, histograms, class frequency.
  *
  * Everything is a plain declarative aggregation — Catalyst plans
  * partial+final HashAggregate with map-side combine automatically, so
  * these scale linearly with data and shuffle only group keys.
  *
  * Numeric discipline (cross-engine hash parity): decimal-accumulated
  * sums / sums of squares, then double arithmetic in a fixed operand
  * order. Spark's `summary()` uses approximate percentiles; we use exact
  * `percentile` (same linear-interpolation definition as DuckDB's
  * `quantile_cont`) so results are oracle-checkable.
  */
object Eda {

  private def dec(c: Column): Column = c.cast("decimal(30,8)")

  /** A1: pandas `describe()` — count, mean, std (ddof=1), min, quartiles,
    * max — one output row per requested numeric column.
    */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { name =>
      val c = col(name)
      val n = count(c)
      val s = sum(dec(c)).cast("double")
      val ss = sum(dec(c * c)).cast("double")
      df.agg(
        n.as("n_count"),
        (s / n).as("mean"),
        sqrt((ss - s * s / n) / (n - lit(1))).as("std"),
        min(c).cast("double").as("min_val"),
        expr(s"percentile($name, 0.25)").as("p25"),
        expr(s"percentile($name, 0.5)").as("p50"),
        expr(s"percentile($name, 0.75)").as("p75"),
        max(c).cast("double").as("max_val"))
        .select(lit(name).as("column_name"), col("*"))
    }.reduce(_ unionAll _)

  /** The 100 TB describe: identical shape, but quartiles via
    * `approx_percentile` (single-pass KLL-style sketch, no sort) and
    * HLL distinct support. Exact `percentile` buffers every value per
    * group — fine at harness scale, wrong at cluster scale.
    */
  def describeApprox(df: DataFrame, cols: Seq[String], accuracy: Int = 10000): DataFrame =
    cols.map { name =>
      val c = col(name)
      val n = count(c)
      val s = sum(dec(c)).cast("double")
      val ss = sum(dec(c * c)).cast("double")
      df.agg(
        n.as("n_count"),
        (s / n).as("mean"),
        sqrt((ss - s * s / n) / (n - lit(1))).as("std"),
        min(c).cast("double").as("min_val"),
        expr(s"approx_percentile($name, 0.25, $accuracy)").as("p25"),
        expr(s"approx_percentile($name, 0.5, $accuracy)").as("p50"),
        expr(s"approx_percentile($name, 0.75, $accuracy)").as("p75"),
        max(c).cast("double").as("max_val"))
        .select(lit(name).as("column_name"), col("*"))
    }.reduce(_ unionAll _)

  /** A2/A7: `value_counts()` — counts per value, most frequent first
    * (value as deterministic tie-break).
    */
  def valueCounts(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col(c))

  /** A5: grouped mean of `target` per `key`, sorted descending
    * (processor.py:39 fraud-rate-by-category).
    */
  def groupedMean(df: DataFrame, key: String, target: String): DataFrame =
    df.groupBy(col(key))
      .agg((sum(dec(col(target))).cast("double") / count(col(target)))
        .as("mean_target"))
      .orderBy(col("mean_target").desc, col(key))

  /** A6: fixed-bin histogram split by a class column (processor.py:45-54,
    * seaborn histplot bins=50). Bounds come from a separate tiny
    * aggregate broadcast back in — two scans, no global sort, no
    * single-partition window.
    */
  def histogram(df: DataFrame, c: String, classCol: String, bins: Int): DataFrame = {
    val bounds = df.agg(
      min(col(c)).cast("double").as("__mn"),
      max(col(c)).cast("double").as("__mx"))
    // constant column -> zero width -> NaN buckets -> ANSI cast error;
    // degenerate to a single bucket instead
    val bucket = when(col("__mx") === col("__mn"), lit(0L)).otherwise(
      least(
        floor((col(c) - col("__mn")) / ((col("__mx") - col("__mn")) / lit(bins.toDouble))),
        lit((bins - 1).toDouble)).cast("long"))
    // nulls are dropped, matching pandas/seaborn histograms — without the
    // filter, least() would skip the null bucket expression and silently
    // bin every null row into the last bucket
    df.filter(col(c).isNotNull)
      .crossJoin(broadcast(bounds))
      .withColumn("bucket", bucket)
      .groupBy(col("bucket"), col(classCol))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("bucket"), col(classCol))
  }

  /** A3: exact + approximate (HLL) distinct counts. The approx path is
    * the 100 TB default; exact `count(DISTINCT)` forces an extra
    * shuffle-dedup pass.
    */
  def distinctCount(df: DataFrame, c: String): DataFrame =
    df.agg(
      countDistinct(col(c)).as("n_distinct"),
      approx_count_distinct(col(c)).as("n_distinct_approx"),
      count(lit(1)).as("n_rows"))

  /** Skew-safe grouped COUNT(DISTINCT): two-stage rewrite — dedup on
    * (key, value) with map-side combine, then count per key. A plain
    * grouped count-distinct funnels every value of a hot key through one
    * task; this shape spreads stage one across (key, value) pairs, so a
    * hot key's values distribute over the cluster. Same exact result.
    */
  def skewSafeCountDistinct(df: DataFrame, key: String, value: String): DataFrame =
    // nulls excluded up front — COUNT(DISTINCT) ignores them, and the
    // (key, NULL) group would otherwise count as one extra value
    df.filter(col(value).isNotNull)
      .groupBy(col(key), col(value)).agg(count(lit(1)).as("__c"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_distinct"))
      .orderBy(col(key))
}

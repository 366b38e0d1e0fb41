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
    *
    * Deliberately one aggregation pass PER column: exact `percentile`
    * buffers every value, and stacking several buffered aggregates into
    * one wide agg pushes the whole thing into sort-based fallback
    * (measured 10x slower than per-column scans at sf0.1). Exact
    * percentiles don't belong at 100 TB anyway — [[describeApprox]] is
    * the single-scan sketch-based form for that regime.
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
        expr(s"percentile(`$name`, 0.25)").as("p25"),
        expr(s"percentile(`$name`, 0.5)").as("p50"),
        expr(s"percentile(`$name`, 0.75)").as("p75"),
        max(c).cast("double").as("max_val"))
        .select(lit(name).as("column_name"), col("*"))
    }.reduce(_ unionAll _)

  private def describeWith(
      df: DataFrame,
      cols: Seq[String],
      quartiles: String => Seq[Column]): DataFrame = {
    val aggs = cols.flatMap { name =>
      val c = col(name)
      val qs = quartiles(name)
      Seq(
        count(c).as(s"${name}__cnt"),
        sum(dec(c)).cast("double").as(s"${name}__s"),
        sum(dec(c * c)).cast("double").as(s"${name}__ss"),
        min(c).cast("double").as(s"${name}__min"),
        qs(0).as(s"${name}__p25"),
        qs(1).as(s"${name}__p50"),
        qs(2).as(s"${name}__p75"),
        max(c).cast("double").as(s"${name}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(n =>
      s"'$n', `${n}__cnt`, `${n}__s`, `${n}__ss`, `${n}__min`, " +
        s"`${n}__p25`, `${n}__p50`, `${n}__p75`, `${n}__max`").mkString(", ")
    one
      .select(expr(s"stack(${cols.size}, $stackArgs) as " +
        "(column_name, n_count, s, ss, min_val, p25, p50, p75, max_val)"))
      .select(
        col("column_name"), col("n_count"),
        (col("s") / col("n_count")).as("mean"),
        sqrt((col("ss") - col("s") * col("s") / col("n_count"))
          / (col("n_count") - lit(1))).as("std"),
        col("min_val"), col("p25"), col("p50"), col("p75"), col("max_val"))
  }

  /** The 100 TB describe: identical shape, but quartiles via
    * `approx_percentile` (single-pass KLL-style sketch, no sort) and
    * HLL distinct support. Exact `percentile` buffers every value per
    * group — fine at harness scale, wrong at cluster scale.
    */
  def describeApprox(df: DataFrame, cols: Seq[String], accuracy: Int = 10000): DataFrame =
    describeWith(df, cols, name =>
      Seq(0.25, 0.5, 0.75).map(q =>
        expr(s"approx_percentile(`$name`, $q, $accuracy)").cast("double")))

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

  /** Per-column profile — the ingest audit (one row per column:
    * null count, distinct count, numeric min/max). Single scan: all
    * per-column aggregates ride one `agg` (multiple exact
    * COUNT(DISTINCT)s plan through one Expand pass), then the wide
    * 1-row result unpivots via `stack` — no per-column job, no driver
    * loop. `exact = false` swaps the distincts for
    * `approx_count_distinct` (HLL): the 100 TB default, where an exact
    * per-column distinct of a high-cardinality id is a full shuffle per
    * Expand replica. Non-numeric columns report null min/max (string
    * collation differs across engines; not worth cross-engine parity).
    */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val numeric = df.schema.fields.collect {
      case f if cols.contains(f.name) &&
        f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
    }.toSet
    def nd(c: String): Column =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs = cols.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(s"__nn_$c"),
        nd(c).as(s"__nd_$c"),
        (if (numeric(c)) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"__mn_$c"),
        (if (numeric(c)) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"__mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // backtick-quote the generated references and escape the label
    // literal (describeWith's discipline): a column named "event time"
    // or "a'b" must not break or corrupt the generated SQL
    val stackArgs = cols.map { c =>
      val label = c.replace("'", "''")
      s"'$label', `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`"
    }.mkString(", ")
    wide.selectExpr("__n",
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_val, max_val)")
      .select(col("col_name"), col("__n").as("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
      .orderBy(col("col_name"))
  }

  /** Top-k values per group by count (trending items per day, heaviest
    * users per segment). The rank window runs over the AGGREGATED
    * (group, value, count) rows — cardinality = distinct pairs, with the
    * raw data already collapsed map-side by the hash aggregate — so the
    * per-group sort that would be a skew hazard over raw events is a
    * small post-aggregation shuffle. Ties break on the value for
    * determinism.
    */
  def topKPerGroup(
      df: DataFrame, groupCol: String, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("n").desc, col(valueCol).asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("rank").cast("long").as("rank"),
        col(valueCol), col("n"))
  }

  /** Benford's-law first-digit audit — the classic fabricated-numbers
    * screen (invoice fraud, padded metrics, synthetic-row detection):
    * per group, the observed leading-digit distribution against the
    * Benford expectation P(d) = log10(1 + 1/d), with the chi-square
    * statistic attached to every digit row. One narrow map + one hash
    * aggregate + a 9-row-per-group window — no shuffle beyond the
    * grouping.
    *
    * Cross-engine determinism: the leading digit comes from the exact
    * DECIMAL(18,6) rendering of the value (first [1-9] of the fixed-
    * scale string — no log10/pow, whose libm rounding differs between
    * engines near powers of ten), and the chi-square terms accumulate
    * in decimal. Zero / null values have no leading digit and are
    * excluded.
    */
  def benfordAudit(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val digit = regexp_extract(
      col(valueCol).cast("decimal(18,6)").cast("string"), "[1-9]", 0)
    val obs = df
      .withColumn("digit", digit)
      .filter(col("digit") =!= "")
      .groupBy(col(groupCol), col("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val fracMap = map((1 to 9).flatMap(d =>
      Seq(lit(d.toString), lit(math.log10(1.0 + 1.0 / d)))): _*)
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    obs
      // a digit a group never produced still contributes (0 - e)^2/e to
      // the statistic, so rebuild the full (group x digit) grid from the
      // group totals and left-join the observations back on
      .groupBy(col(groupCol)).agg(sum(col("n_obs")).as("n_total"))
      .select(col(groupCol), col("n_total"),
        explode(array((1 to 9).map(d => lit(d.toString)): _*)).as("digit"))
      .join(obs, Seq(groupCol.toString, "digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("benford_frac", element_at(fracMap, col("digit")))
      .withColumn("__e", col("n_total") * col("benford_frac"))
      .withColumn("__term",
        (col("n_obs") - col("__e")) * (col("n_obs") - col("__e")) / col("__e"))
      .withColumn("chi2",
        sum(col("__term").cast("decimal(30,15)")).over(wg).cast("double"))
      .select(col(groupCol), col("digit"), col("n_obs"), col("n_total"),
        round(col("benford_frac"), 12).as("benford_frac"),
        round(col("__term"), 12).as("chi2_term"),
        round(col("chi2"), 12).as("chi2"))
  }

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

  /** EXACT interpolated percentile bands per group (Spark `percentile`
    * ≡ DuckDB `quantile_cont` — probed bit-identical on the harness
    * data; a round-to-9 guards the 1-ulp interpolation tail anyway).
    * One column per requested probability, named `p<percent>` (p25,
    * p50, …; fractional percents get the dot stripped: 0.125 → p12_5).
    *
    * Scale note: exact percentiles sort each group's values (Spark
    * buffers them per group) — the AUDIT path. For dashboard-grade
    * numbers at full scale use [[describeApprox]] / percentile_approx,
    * which streams in bounded memory; this operator is for the
    * slices where exactness is the point (SLA verification, parity
    * testing, release gates).
    */
  def percentileBands(
      df: DataFrame, groupCol: String, valueCol: String,
      probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probs must be within [0, 1], got $probs")
    def nameOf(p: Double): String = {
      val pct = p * 100
      if (pct == pct.floor) s"p${pct.toInt}"
      else ("p" + pct.toString.replace('.', '_')).stripSuffix("_0")
    }
    val aggs = probs.map(p =>
      round(expr(s"percentile($valueCol, ${p}d)"), 9).as(nameOf(p)))
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** 2-D skyline (Pareto frontier, maximizing both axes): rows not
    * dominated by any other — no other row is >= on both axes and
    * strictly greater on one. Exact ties on both axes all survive.
    *
    * The sorted-scan formulation: a row is on the skyline iff its y
    * strictly exceeds every y at strictly larger x AND it carries its
    * own x's max y. Both conditions come from one per-x aggregate plus
    * one ordered window over the DISTINCT x values (bounded by |distinct
    * x|, not |rows| — the window never sees the raw table, so there is
    * no single-partition pass over data-sized input; for |distinct x| at
    * true cluster scale, range-partition the x axis first and stitch
    * per-partition skylines with their boundary maxima).
    */
  def skyline2d(
      df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perX = df.groupBy(col(xCol)).agg(max(col(yCol)).as("__ymax"))
    val w = Window.orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perX
      .withColumn("__prev", max(col("__ymax")).over(w))
      .filter(col("__prev").isNull || col("__ymax") > col("__prev"))
      .select(col(xCol), col("__ymax"))
    df.join(frontier, Seq(xCol))
      .filter(col(yCol) === col("__ymax"))
      .drop("__ymax")
  }

}

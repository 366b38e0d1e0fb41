package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One harness query: a Spark implementation over the `/root/testdata`
  * tables plus (where SQL-expressible) an equivalent DuckDB oracle over the
  * same parquet files. Column names MUST match between the two — the
  * driver sorts columns by name before hashing values.
  *
  * Numeric parity discipline (so value hashes match bit-for-bit):
  *   - sums: cast the operand to DECIMAL before summing (exact,
  *     order-independent), cast the result back to DOUBLE;
  *   - means: exact decimal sum divided by exact count, in double;
  *   - never emit raw double sums (parallel summation order differs).
  */
final case class HarnessQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  /** All registered queries, in build order. Names must be unique — a
    * duplicate would silently shadow a query in the harness Maps.
    */
  def all: Seq[HarnessQuery] = {
    val qs = CoreQueries.all ++ CleaningQueries.all ++ FeatureQueries.all ++
      EdaQueries.all ++ MlQueries.all ++ LlmQueries.all ++
      StreamingQueries.all ++ EvalQueries.all ++ SourceQueries.all ++
      QualityQueries.all ++ AnalyticsQueries.all ++ TimeSeriesQueries.all ++
      WorkloadQueries.all ++ VectorTextQueries.all ++ ClassifyQueries.all ++
      RecommendQueries.all ++ ModelQueries.all ++ SketchQueries.all
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

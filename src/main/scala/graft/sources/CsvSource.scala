package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CSV scan (reference `src/ingestion/load_data.py:19-55`): one CSV per
  * logical table name, header row. The reference infers dtypes per read
  * and patches them later; here each domain table has an explicit
  * `StructType` (FIXTURES.md §A) so the scan is single-pass (no
  * inference scan) and Catalyst can prune/push down immediately.
  * A missing path fails fast — the reference's `None` entry aborts the
  * pipeline anyway (`processor.py:99-100`).
  */
object CsvSource {

  /** Fraud_Data.csv (FIXTURES.md A1). ip_address stays String: values mix
    * dotted quads and numeric floats; parsed by IpFunctions.ipToInt.
    */
  val fraudData: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("signup_time", StringType),
    StructField("purchase_time", StringType),
    StructField("purchase_value", DoubleType),
    StructField("device_id", StringType),
    StructField("source", StringType),
    StructField("browser", StringType),
    StructField("sex", StringType),
    StructField("age", DoubleType),
    StructField("ip_address", StringType),
    StructField("class", IntegerType)))

  /** IpAddress_to_Country.csv (FIXTURES.md A2). */
  val ipToCountry: StructType = StructType(Seq(
    StructField("lower_bound_ip_address", StringType),
    StructField("upper_bound_ip_address", StringType),
    StructField("country", StringType)))

  /** creditcard.csv (FIXTURES.md A3, standard ULB layout). */
  val creditcard: StructType = StructType(
    StructField("Time", DoubleType) +:
      (1 to 28).map(i => StructField(s"V$i", DoubleType)) :+
      StructField("Amount", DoubleType) :+
      StructField("Class", IntegerType))

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** Load the reference's three named tables from config paths
    * (load_data.py:39-55 semantics, fail-fast on missing files).
    */
  def loadAll(spark: SparkSession, paths: Map[String, String]): Map[String, DataFrame] = {
    val schemas = Map(
      "fraud_data" -> fraudData,
      "ip_to_country" -> ipToCountry,
      "creditcard_data" -> creditcard)
    paths.map { case (name, path) =>
      val schema = schemas.getOrElse(name,
        throw new IllegalArgumentException(s"unknown dataset: $name"))
      name -> read(spark, path, schema)
    }
  }
}

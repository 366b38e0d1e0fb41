package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types._

/** Typed access to the harness star schema + events/documents/embeddings
  * parquet tables (see /root/repo/TESTDATA.md, FIXTURES.md §B).
  *
  * Explicit schemas everywhere: the reference engine infers schemas per
  * CSV read (reference `src/ingestion/load_data.py:44`) and then patches
  * them imperatively; here every scan declares its `StructType` up front
  * so Catalyst can prune columns and push predicates into the vectorized
  * parquet reader without an inference pass.
  */
object Tables {

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events,
    "documents" -> documents, "embeddings" -> embeddings)

  /** Raw-long read schema for the TIMESTAMP(NANOS) vintage of
    * events.parquet, which Spark's parquet reader otherwise rejects
    * ([PARQUET_TYPE_ILLEGAL]). Nanos come in as Long (via the legacy
    * conf), then integer-divide to microseconds — `div`, not `/`:
    * double division loses bits at 1.7e18 and shifts timestamps by up
    * to ±256 ns, enough to flip a microsecond.
    */
  private val eventsRaw: StructType = StructType(
    events.fields.map(f =>
      if (f.name == "ts") StructField("ts", LongType) else f))

  /** Footer-sniffed timestamp unit of the `ts` column, cached per path.
    * The harness testdata has shipped both TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) vintages across rounds; trusting either blindly
    * poisons every ts-semantics query when the vintage flips (micros
    * interpreted as nanos compresses a month into ~42 minutes), so the
    * loader reads the parquet logical type and branches.
    */
  private val tsUnitCache = TrieMap.empty[String, TimeUnit]

  private def eventsTsUnit(spark: SparkSession, path: String): TimeUnit =
    tsUnitCache.getOrElseUpdate(path, {
      val conf = spark.sessionState.newHadoopConf()
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      val file =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).map(_.getPath)
            .filter(f => f.getName.endsWith(".parquet") || f.getName.startsWith("part-"))
            .sortBy(_.getName).headOption
            .getOrElse(throw new IllegalArgumentException(s"no parquet files under $path"))
        else p
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        schema.getType(schema.getFieldIndex("ts"))
          .asPrimitiveType().getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation => t.getUnit
          case _ => TimeUnit.MICROS // unannotated INT64: Spark's own convention is micros
        }
      } finally reader.close()
    })

  /** Load one named table from an sf directory. Explicit schema keeps the
    * scan inference-free; parquet logical types still dictate physical
    * decode, so this is a checked cast, not a blind one.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      val path = s"$sfDir/events.parquet"
      if (eventsTsUnit(spark, path) == TimeUnit.NANOS) {
        // SESSION-WIDE side effect, deliberately: Spark only decodes
        // TIMESTAMP(NANOS) under this legacy conf (as raw nanos longs,
        // converted to micros right here). It cannot be scoped to one
        // read, so any OTHER nanos-timestamp parquet read in the same
        // session will also decode as longs instead of erroring —
        // callers mixing in external nanos data must convert as here.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.schema(eventsRaw).parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      } else {
        // MICROS (or MILLIS) — Spark-native units; plain typed read.
        spark.read.schema(events).parquet(path)
      }
    } else {
      val schema = schemas.getOrElse(name,
        throw new IllegalArgumentException(s"unknown table: $name"))
      spark.read.schema(schema).parquet(s"$sfDir/$name.parquet")
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

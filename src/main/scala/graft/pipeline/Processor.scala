package graft.pipeline

import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.FeaturePipeline
import graft.ml.FeaturePipeline.FeatureConfig
import graft.operators._
import graft.sources.{CsvSource, PipelineConfig}

/** EP1/EP2/EP3 orchestration (reference `src/processor.py` +
  * `run_pipeline.py`): config -> load -> clean -> transform -> split ->
  * featurize -> rebalance -> parquet sinks.
  *
  * Spark shape (SURVEY.md §3): steps up to the split are ONE lazy
  * DataFrame DAG — narrow maps, one broadcast range join, three window
  * shuffles; nothing materializes until the split's window ranking. The
  * MLlib fit triggers its own aggregation jobs on the cached train set.
  */
object Processor {

  /** Clean the fraud table (clean_data.py:71-86): drop null-IP rows,
    * coerce the two time columns, dedup, derive the uint32 IP.
    */
  def cleanFraud(df: DataFrame): DataFrame = {
    val noNull = Cleaning.dropNullRows(df, Seq("ip_address"))
    val times = Cleaning.coerceTimestamps(noNull, Seq("signup_time", "purchase_time"))
    Cleaning.withIpInt(Cleaning.dedup(times), "ip_address", "ip_address_int")
  }

  /** Clean the IP->country map (clean_data.py:88-96). */
  def cleanIpMap(df: DataFrame): DataFrame = {
    val d = Cleaning.dedup(df)
    Cleaning.withIpInt(
      Cleaning.withIpInt(d, "lower_bound_ip_address", "lower_bound_ip_address_int"),
      "upper_bound_ip_address", "upper_bound_ip_address_int")
  }

  /** Clean the creditcard table (clean_data.py:98-105): dedup only. */
  def cleanCreditcard(df: DataFrame): DataFrame = Cleaning.dedup(df)

  /** transform_data.py:113-132 fraud branch up to X/y prep: geolocate,
    * engineer temporal + velocity features, drop leak/id columns.
    */
  def transformFraud(fraud: DataFrame, ipMap: DataFrame): DataFrame = {
    val geo = RangeJoin.geolocate(fraud, ipMap)
    val feat = TimeFeatures.engineerFraudFeatures(geo)
    feat
      .drop("signup_time", "purchase_time", "device_id", "ip_address",
        "ip_address_int")
      .withColumnRenamed("class", "label")
  }

  final case class PreppedDataset(
      train: DataFrame,
      test: DataFrame,
      featureNames: Seq[String])

  /** EP3 (processor.py:56-85): stratified split -> fit-on-train
    * featurization -> rebalance train by strategy. Test is never
    * resampled (imblearn contract).
    */
  def preprocessDataset(
      df: DataFrame,
      cfg: PipelineConfig,
      numericCols: Seq[String],
      categoricalCols: Seq[String],
      idCol: String): PreppedDataset = {
    // missing_value_strategy extends to engineered features: a row whose
    // timestamp failed coercion has null time features, which no
    // estimator accepts downstream. "drop" removes such rows; "impute"
    // fills them with the column mean (the strategy the reference
    // declares but never implemented — clean_data.py:24-25)
    val complete = cfg.missingValueStrategy match {
      case "drop"          => df.na.drop(numericCols)
      case "impute"        => Cleaning.imputeMean(df, numericCols)
      case "impute_median" => Cleaning.imputeMedian(df, numericCols)
      // a typo'd strategy must fail here, like imbalanceStrategy does —
      // silently skipping null handling surfaces later as an opaque
      // VectorAssembler error (or worse, a clean-looking wrong run)
      case other => throw new IllegalArgumentException(
        s"unknown missing value strategy: $other " +
          "(expected drop | impute | impute_median)")
    }
    // categorical inputs must be strings for StringIndexer; numeric
    // category codes (hour_of_day) cast through
    val stringified = categoricalCols.foldLeft(complete)(
      (d, c) => d.withColumn(c, col(c).cast("string")))
    val split = Split.stratified(
      stringified, "label", cfg.testSize, cfg.randomState, Seq(col(idCol)))
    val fcfg = FeatureConfig(numericCols, categoricalCols)
    // cache the train side across the estimator fits (StringIndexer /
    // StandardScaler each scan it), then RELEASE the blocks: the split
    // membership is a content hash, so the lazy downstream transforms
    // recompute it identically — no leaked cache in a long session
    val cachedTrain = split.train.cache()
    val (model, trainF, testF) =
      FeaturePipeline.fitTransform(cachedTrain, split.test, fcfg)
    val names = FeaturePipeline.featureNames(model, fcfg)
    cachedTrain.unpersist(false)

    val slim = (d: DataFrame) => d.select(
      col(idCol), col("label").cast("long").as("label"),
      vector_to_array(col("features")).as("features"))
    val train = cfg.imbalanceStrategy match {
      case "smote" =>
        Smote.smote(slim(trainF), "label", "features", k = 5,
          seed = cfg.randomState, idCol = idCol)
      case "undersample" =>
        Balance.undersample(slim(trainF), "label", cfg.randomState,
          Seq(col(idCol)))
      case other =>
        throw new IllegalArgumentException(s"unknown imbalance strategy: $other")
    }
    PreppedDataset(train, slim(testF), names)
  }

  final case class PipelineOutputs(
      fraud: PreppedDataset,
      creditcard: PreppedDataset)

  /** EP1 (processor.py:87-113): full batch pipeline over the three domain
    * CSVs. Returns both prepped datasets; [[writeOutputs]] persists the
    * named parquet sinks (the reference's result dict,
    * transform_data.py:150-161).
    *
    * Execution note: the returned frames are LAZY — each downstream
    * action (SMOTE's internal fits, each of writeOutputs' four writes)
    * re-executes its upstream DAG. That is correct by construction
    * (split membership and row ids are content hashes, identical on
    * every recomputation) and the right default for the domain-CSV
    * scale this pipeline targets; a deployment where the upstream is
    * expensive should cut a stage boundary on the [[PreppedDataset]]
    * frames with [[graft.Materialize.cut]] before writing, trading
    * checkpoint storage for the re-executions.
    */
  def runPipeline(spark: SparkSession, cfg: PipelineConfig): PipelineOutputs = {
    val tables = CsvSource.loadAll(spark, cfg.dataPaths)
    val fraud = cleanFraud(tables("fraud_data"))
    val ipMap = cleanIpMap(tables("ip_to_country"))
    val credit = cleanCreditcard(tables("creditcard_data"))

    val fraudX = transformFraud(fraud, ipMap)
    val fraudPrep = preprocessDataset(
      fraudX, cfg, cfg.numericalFeatures, cfg.categoricalFeatures, "user_id")

    // content-hash row id, NOT monotonically_increasing_id: the split
    // membership and SMOTE's row identity hash on this id, and a
    // monotonic id is a function of partition layout — each downstream
    // action (SMOTE's fits, the four writes) re-executes this DAG, and
    // any layout change between executions would reassign ids, flipping
    // split membership (train/test leakage). Rows are distinct after
    // cleanCreditcard's dedup, so the full-row hash is unique up to a
    // 2^-64-scale birthday collision — and a pure function of content,
    // identical on every recomputation.
    val creditRenamed = credit.withColumnRenamed("Class", "label")
    val creditX = creditRenamed
      .withColumn("__row_id", xxhash64(creditRenamed.columns.map(col): _*))
    val creditNums = credit.columns.filterNot(c => c == "Class").toSeq
    val creditPrep = preprocessDataset(
      creditX, cfg, creditNums, Seq.empty, "__row_id")
    PipelineOutputs(fraudPrep, creditPrep)
  }

  def writeOutputs(out: PipelineOutputs, outDir: String): Unit = {
    val spark = out.fraud.train.sparkSession
    import spark.implicits._
    out.fraud.train.write.mode("overwrite").parquet(s"$outDir/fraud_train")
    out.fraud.test.write.mode("overwrite").parquet(s"$outDir/fraud_test")
    out.creditcard.train.write.mode("overwrite").parquet(s"$outDir/credit_train")
    out.creditcard.test.write.mode("overwrite").parquet(s"$outDir/credit_test")
    // the reference's feature-name lists (transform_data.py:150-161) as
    // their own named sinks
    out.fraud.featureNames.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("idx", "feature_name")
      .write.mode("overwrite").parquet(s"$outDir/fraud_feature_names")
    out.creditcard.featureNames.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("idx", "feature_name")
      .write.mode("overwrite").parquet(s"$outDir/credit_feature_names")
  }

  /** EP2 (processor.py:21-54): the EDA fan-out as named result frames
    * over one cached input.
    */
  def edaReport(df: DataFrame, numericCols: Seq[String],
      categoricalCols: Seq[String], targetCol: String): Map[String, DataFrame] = {
    // no internal cache: each report frame re-scans the input, which at
    // corpus scale is the right default (pinning a 100 TB input for a
    // handful of small aggregates is the wrong trade, and a returned
    // Map gives no hook to ever unpersist). A caller holding a small,
    // expensive-to-recompute input can cache it around this call.
    val base = Map(
      "describe" -> Eda.describe(df, numericCols),
      "class_distribution" -> Eda.valueCounts(df, targetCol))
    val rates = categoricalCols.map(c =>
      s"rate_by_$c" -> Eda.groupedMean(df, c, targetCol)).toMap
    val hists = numericCols.map(c =>
      s"hist_$c" -> Eda.histogram(df, c, targetCol, bins = 50)).toMap
    base ++ rates ++ hists
  }
}

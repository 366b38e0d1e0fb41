package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Data-layout sinks — where 100 TB performance is actually won or
  * lost. Partition pruning only works if the data was written
  * partitioned; rowgroup skipping only works if values were clustered
  * at write time.
  *
  *   - [[writePartitioned]]: hive-style directory partitioning on a
  *     low-cardinality column + within-file clustering on a sort key —
  *     `spark.read.parquet(path).where(partCol === x)` then prunes
  *     directories for free, and min/max rowgroup stats on the sort
  *     key prune pages within files.
  *   - [[writeClustered]]: no directory partitioning, but
  *     `repartitionByRange` + in-partition sort — the write-side shape
  *     for range-predicate-heavy columns (timestamps), producing
  *     non-overlapping min/max ranges per file.
  *
  * `targetFileRows` caps rows per output file (`maxRecordsPerFile`) so
  * a skewed partition cannot produce a multi-GB file.
  */
object Layout {

  /** @param tasksPerPartition parallelism within one partition VALUE —
    *        repartitioning on the partition column alone would funnel a
    *        skewed value (80% of rows = one event_type) through a
    *        single task; a sort-key-derived salt splits it across this
    *        many tasks while keeping each file internally sorted.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partCol: String,
      sortCol: String,
      targetFileRows: Long = 5000000L,
      tasksPerPartition: Int = 8): Unit =
    df.repartition(col(partCol),
        pmod(hash(col(sortCol)), lit(tasksPerPartition)))
      .sortWithinPartitions(col(partCol), col(sortCol))
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", targetFileRows)
      .partitionBy(partCol)
      .parquet(path)

  def writeClustered(
      df: DataFrame,
      path: String,
      rangeCol: String,
      numFiles: Int,
      targetFileRows: Long = 5000000L): Unit =
    df.repartitionByRange(numFiles, col(rangeCol))
      .sortWithinPartitions(col(rangeCol))
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", targetFileRows)
      .parquet(path)

  /** Z-order (Morton-curve) clustering across SEVERAL columns:
    * [[writeClustered]] gives perfect min/max pruning on ONE column and
    * none on any other; interleaving the bits of per-column bucket ids
    * gives every z-column a bounded per-file value range, so rowgroup
    * stats prune scans filtered on ANY of them (the layout Delta's
    * `OPTIMIZE ZORDER BY` produces, built from public parquet + range
    * partitioning).
    *
    * Columns are first rank-normalized into `2^bitsPerDim` buckets via
    * approximate quantile boundaries (equal-POPULATION buckets — an
    * equal-width mapping would collapse under skew and waste curve
    * resolution on empty space; the approximation shifts bucket edges,
    * never breaks the curve's locality). The boundary collect is one
    * distributed aggregate returning `dims × (2^bitsPerDim − 1)` doubles
    * to the driver — vanishing next to the write it organizes.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      zCols: Seq[String],
      numFiles: Int,
      bitsPerDim: Int = 8,
      targetFileRows: Long = 5000000L): Unit = {
    require(zCols.size >= 2,
      "z-order needs >= 2 columns (use writeClustered for one)")
    require(bitsPerDim >= 1 && bitsPerDim * zCols.size <= 62,
      s"bitsPerDim * dims must fit a long, got $bitsPerDim * ${zCols.size}")
    val b = 1 << bitsPerDim
    val probs = (1 until b).map(_.toDouble / b)
    val boundsRow = df.select(zCols.map(c =>
      percentile_approx(col(c).cast("double"),
        array(probs.map(lit): _*), lit(10000)).as(c)): _*).head()
    val buckets = zCols.zipWithIndex.map { case (c, d) =>
      // an all-null column gives null percentile bounds; null VALUES give
      // a null filter result — either way the dimension falls back to
      // bucket 0 (contributes no bits) instead of nulling the whole
      // z-value, which would range-partition every row into ONE task and
      // silently lose clustering on the other dimensions too
      val bounds = Option(boundsRow.getSeq[Double](d)).getOrElse(Seq.empty)
      // bucket = #boundaries <= value, i.e. equal-population rank bucket
      coalesce(
        size(filter(typedlit(bounds), bd => bd <= col(c).cast("double"))),
        lit(0))
    }
    val zvalue =
      if (zCols.size == 2)
        // 2-D: one codegen'd interleave call
        // ([[graft.functions.MortonExpr]]) instead of 2·bits
        // shift/mask Column nodes
        graft.functions.MortonExpr.morton(df.sparkSession,
          buckets(0).cast("long"), buckets(1).cast("long"))
      else buckets.zipWithIndex.map { case (bucket, d) =>
        // spread bucket bit i to z-bit (i*dims + d)
        (0 until bitsPerDim).map(i =>
          shiftleft(shiftright(bucket, i).bitwiseAND(lit(1)).cast("long"),
            i * zCols.size + d))
          .reduce(_ + _)
      }.reduce(_ + _)
    df.withColumn("__z", zvalue)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", targetFileRows)
      .parquet(path)
  }
}

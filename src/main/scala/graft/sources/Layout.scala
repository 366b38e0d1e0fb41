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
}

package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `binaryFile`-format ingestion — the multimodal on-ramp: raw media
  * files (images, audio, arbitrary blobs) land as (path, length,
  * content) rows WITHOUT a decode step, and the typed pipeline
  * ([[graft.operators.Multimodal]]) takes over from the binary column.
  * Spark's reader parallelizes over files; at corpus scale the
  * partitioning unit is the file, so millions of small media files
  * want a compaction pass into parquet binary columns right after this
  * read (exactly what [[fingerprints]] + a parquet sink produce).
  */
object BinaryFiles {

  /** Read every file under `dir` (non-recursive glob) as binary rows. */
  def readDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)

  /** Stable per-file fingerprints from a binary read: file name (not
    * the machine-local path), byte length, md5 hex — the identity a
    * media-dedup or manifest-diff step keys on.
    */
  def fingerprints(df: DataFrame): DataFrame =
    df.select(
      element_at(split(col("path"), "/"), -1).as("file_name"),
      col("length"),
      md5(col("content")).as("content_md5"))

  /** Test/demo helper: write each (name, text) row as a UTF-8 file
    * under `dir`. Driver-side by design — provisioning fixture files
    * is setup, not dataflow.
    */
  def writeTextFiles(rows: Seq[(String, String)], dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    rows.foreach { case (name, text) =>
      Files.write(Paths.get(dir, name),
        text.getBytes(StandardCharsets.UTF_8))
    }
  }
}

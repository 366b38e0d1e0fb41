package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink — the interchange format LLM corpora actually
  * ship in (one JSON document per line: The Pile, RedPajama, Dolma,
  * FineWeb all publish as jsonl/jsonl.zst).
  *
  * Same discipline as [[CsvSource]]: an explicit `StructType` per read,
  * never schema inference — an inference pass over a 100 TB corpus is a
  * full extra scan before the first real one, and worse, a sampled
  * inference can type a column differently between ingest runs (a
  * numeric-looking `id` appears in one day's sample, not the next),
  * silently forking downstream plans. `mode = FAILFAST` surfaces corrupt
  * lines at the scan instead of materializing nulls kilometers
  * downstream; `PERMISSIVE` + `corruptCol` is the quarantine form that
  * keeps bad lines inspectable (`_corrupt_record` per Spark convention).
  *
  * Writes go through the built-in json sink (one JSON object per line =
  * jsonl); compression is the caller's choice — at scale use a split-
  * table codec or size `maxRecordsPerFile` so a file is a work unit.
  */
object JsonlSource {

  /** Strict read: corrupt lines fail the scan. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Quarantine read: corrupt lines land whole in `corruptCol` (null
    * everywhere else), valid lines have `corruptCol` null — filter on it
    * to split the clean stream from the quarantine stream in one scan.
    *
    * Contract: materialize (cache / write) the parsed frame BEFORE a
    * query that references only `corruptCol` — Spark rejects
    * corrupt-column-only queries straight off raw files
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN), since that would re-parse the
    * file just to report its failures.
    */
  def readQuarantine(
      spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  def write(df: DataFrame, path: String,
      compression: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    compression.fold(w)(c => w.option("compression", c)).json(path)
  }
}

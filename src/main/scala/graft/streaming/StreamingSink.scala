package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.streaming.StreamingQuery

/** Exactly-once file output for streaming pipelines.
  *
  * Structured Streaming's built-in file sink is already exactly-once
  * for append-only parquet, but any sink reached through `foreachBatch`
  * (tables, upserts, multi-destination fan-out) drops to at-least-once:
  * after a failure the engine REPLAYS the last uncommitted micro-batch,
  * and a naive append writes its rows twice. The standard fix is to
  * make the batch write IDEMPOTENT, keyed by the deterministic
  * `batchId` the engine passes in — a replay then overwrites its own
  * partial output instead of duplicating it.
  *
  * [[writeBatchIdempotent]] is that write, exposed separately so tests
  * (and batch backfills) can call it directly; [[parquetExactlyOnce]]
  * wires it behind `foreachBatch` with a required checkpoint location
  * (no checkpoint = no batch-id continuity = no exactly-once).
  *
  * Layout note: `batch_id=N` directories make batch id a partition
  * column on read — consumers see one logical dataset, and a
  * re-processed batch replaces exactly its own directory.
  */
object StreamingSink {

  def writeBatchIdempotent(batch: Dataset[Row], batchId: Long, path: String): Unit =
    batch.write.mode(SaveMode.Overwrite).parquet(s"$path/batch_id=$batchId")

  def parquetExactlyOnce(
      stream: DataFrame,
      path: String,
      checkpointDir: String): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "exactly-once needs a checkpoint dir: batch ids must survive restart")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        writeBatchIdempotent(batch, id, path)
      }
      .start()
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture merge: apply a keyed delta batch (upserts +
  * deletes) to a snapshot — the MERGE INTO of a warehouse refresh cycle,
  * expressed as pure dataflow so it runs on any snapshot a DataFrame can
  * read. Last-writer-wins within the batch is the caller's contract
  * (dedup the delta first with [[Cleaning]] keep-latest if needed).
  *
  * Scale shape: one LEFT ANTI join on the key (snapshot rows whose key
  * appears in the delta drop out) plus a union with the delta's
  * surviving rows — both sides shuffle ONLY on the key, payloads ride
  * along untouched, and a small delta broadcasts its key set. No full
  * outer join, no window.
  */
object Merge {

  /** SCD Type-2 dimension from a keyed change LOG: one validity
    * interval per (key, change) with `valid_from` = the change's
    * timestamp and `valid_to` = the NEXT change's timestamp for the
    * key (exclusive; open intervals get null — "current"). The
    * point-in-time join against it is a plain range join
    * (`fact.ts >= valid_from AND (valid_to IS NULL OR fact.ts <
    * valid_to)`) — [[RangeJoin]]'s territory; this builds the
    * dimension side.
    *
    * Ordering ties break on `tieCol`, so two same-timestamp changes
    * version deterministically (the later tie wins the shared
    * instant with a zero-width interval, exactly like a warehouse
    * sequence column). Shape: ONE key-partitioned lead window — the
    * log is already the shuffle unit; no joins.
    */
  def scd2Intervals(
      changeLog: DataFrame, key: String, tsCol: String,
      tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(tsCol), col(tieCol))
    changeLog
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Extract the CDC delta BETWEEN two snapshots — the inverse of
    * [[upsert]]: rows only in `newDf` emit op I, rows only in `oldDf`
    * emit op D, keys present in both with a changed payload
    * fingerprint emit op U; unchanged rows emit nothing. Feeding the
    * result back through `upsert(oldDf, delta, key, "op")` reproduces
    * `newDf` — the round-trip a change-data feed must satisfy.
    *
    * One full-outer join on the key carrying only ids + 128-bit
    * payload fingerprints; the delta payload joins back against
    * `newDf`/`oldDf` by key afterward, so wide rows never ride
    * through the outer join.
    */
  def extractDelta(
      oldDf: DataFrame, newDf: DataFrame, key: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    def fp(df: DataFrame, side: String): DataFrame =
      df.select(col(key).as(s"__k_$side"),
        md5(concat_ws("\u0001",
          payloadCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
          .as(s"__fp_$side"))
    val ops = fp(oldDf, "old")
      .join(fp(newDf, "new"), col("__k_old") === col("__k_new"), "full_outer")
      .select(
        coalesce(col("__k_new"), col("__k_old")).as(key),
        when(col("__k_old").isNull, "I")
          .when(col("__k_new").isNull, "D")
          .when(col("__fp_old") =!= col("__fp_new"), "U")
          .otherwise("=").as("op"))
      .where(col("op") =!= "=")
    ops
  }

  /** Apply `delta` to `snapshot`. `delta` carries the snapshot schema
    * plus `opCol`; rows with `opCol === deleteOp` delete their key,
    * every other delta row replaces (update) or introduces (insert)
    * its key. Emits the merged snapshot with the snapshot's columns.
    */
  def upsert(
      snapshot: DataFrame,
      delta: DataFrame,
      key: String,
      opCol: String,
      deleteOp: String = "D"): DataFrame = {
    val untouched = snapshot.join(
      delta.select(col(key)).distinct(), Seq(key), "left_anti")
    val applied = delta.filter(col(opCol) =!= deleteOp).drop(opCol)
      .select(snapshot.columns.map(col): _*)
    untouched.unionByName(applied)
  }

  /** Audit counts for a merge without materializing it twice: one row —
    * n_snapshot, n_delta, n_inserted (delta keys absent from the
    * snapshot, non-delete), n_updated (present, non-delete), n_deleted
    * (present, delete), n_result (what [[upsert]] would emit). Assumes
    * the snapshot is KEYED (key unique) — the contract MERGE INTO has.
    */
  def audit(
      snapshot: DataFrame,
      delta: DataFrame,
      key: String,
      opCol: String,
      deleteOp: String = "D"): DataFrame = {
    val snapKeys = snapshot.select(col(key)).distinct()
      .withColumn("__in_snap", lit(true))
    val d = delta.select(col(key), col(opCol))
      .join(snapKeys, Seq(key), "left")
      .agg(
        count(lit(1)).as("n_delta"),
        sum(when(col(opCol) =!= deleteOp && col("__in_snap").isNull, 1L)
          .otherwise(0L)).as("n_inserted"),
        sum(when(col(opCol) =!= deleteOp && col("__in_snap").isNotNull, 1L)
          .otherwise(0L)).as("n_updated"),
        sum(when(col(opCol) === deleteOp && col("__in_snap").isNotNull, 1L)
          .otherwise(0L)).as("n_deleted"))
    snapshot.agg(count(lit(1)).as("n_snapshot"))
      .crossJoin(d)
      .select(col("n_snapshot"), col("n_delta"), col("n_inserted"),
        col("n_updated"), col("n_deleted"),
        (col("n_snapshot") + col("n_inserted") - col("n_deleted"))
          .as("n_result"))
  }

  /** Incremental view maintenance for a (count, sum) aggregate: apply a
    * row-level delta stream (+1 inserts / -1 retractions) to a
    * materialized per-key state WITHOUT rescanning the base table —
    * the counting/retraction algorithm every streaming aggregation and
    * materialized-view refresher runs.
    *
    *   n'   = n + sum(op)
    *   sum' = sum + sum(op * value)     (decimal — exact retraction)
    * Keys whose count reaches zero drop out of the view (their sum is
    * exactly retracted back to zero by decimal arithmetic). Keys seen
    * only in the delta enter with state (0, 0).
    *
    * Shape: one hash aggregate over the delta + one outer equi-join
    * with the state — cost scales with |delta| + |state|, never with
    * the base table.
    *
    * @param state  (keyCol, nCol, sumCol) — sumCol decimal(30,6)
    * @param deltas rows with (keyCol, opCol = +1|-1, valCol)
    */
  def applyAggDelta(
      state: DataFrame,
      deltas: DataFrame,
      keyCol: String,
      nCol: String,
      sumCol: String,
      opCol: String,
      valCol: String): DataFrame = {
    val d = deltas.groupBy(col(keyCol)).agg(
      sum(col(opCol).cast("long")).as("__dn"),
      sum((col(opCol) * col(valCol)).cast("decimal(30,6)"))
        .cast("decimal(30,6)").as("__ds"))
    state.join(d, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col(nCol), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as(nCol),
        (coalesce(col(sumCol), lit(0).cast("decimal(30,6)")) +
          coalesce(col("__ds"), lit(0).cast("decimal(30,6)")))
          .cast("decimal(30,6)").as(sumCol))
      .filter(col(nCol) > 0)
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Materialize
import graft.operators.Preference

/** Continual preference-rating service: pairwise A-vs-B verdicts
  * arrive as micro-batches (judge-model outputs, human labels), each
  * batch's oriented duel counts fold into the ACCUMULATED pair table
  * by sum, and fresh Bradley–Terry ratings
  * ([[Preference.bradleyTerryFromPairs]]) are emitted after every
  * merge — the leaderboard that updates as verdicts stream in.
  *
  * Pair counts are ADDITIVE, so the streamed state after batch i
  * EQUALS the one-shot pair aggregation over everything seen through
  * batch i, and the emitted ratings equal
  * [[Preference.bradleyTerry]] over the same prefix — the
  * batch/stream equivalence the spec pins (the [[ContinualCounts]]
  * linear-state discipline, applied to a preference model).
  *
  * Scale shape: cross-batch state is the ORIENTED PAIR TABLE —
  * item-pair cardinality, CONSTANT in stream length (items are
  * models/policies, few by construction); each trigger costs one
  * batch-sized hash aggregate, a pair-table merge, and the MM rounds
  * on the merged table (broadcast joins, `Materialize.cut` per
  * round). State crosses triggers through [[Materialize.cut]].
  */
object ContinualPreference {

  final case class SteppedRatings(ratings: DataFrame, pairs: DataFrame)

  /** One stepped batch: merge the batch's oriented duel counts into
    * the accumulated pair table, re-rate, carry the merged table
    * forward.
    */
  def mergeAndRate(
      pairs: DataFrame,
      batch: DataFrame,
      winnerCol: String,
      loserCol: String,
      rounds: Int = 5): SteppedRatings = {
    val batchPairs = batch
      .select(col(winnerCol).as("a"), col(loserCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
    val merged = Materialize.cut(
      pairs.unionByName(batchPairs)
        .groupBy(col("a"), col("b")).agg(sum(col("n")).as("n")))
    val ratings = Materialize.cut(
      Preference.bradleyTerryFromPairs(merged, rounds))
    SteppedRatings(ratings, merged)
  }

  /** Deterministic batch-mode replay: fold [[mergeAndRate]] over an
    * ordered batch sequence from an empty pair table. Output: one row
    * per (batch_id, item) with the ratings AFTER that batch. The
    * streaming entry [[start]] produces exactly these rows for the
    * same batch split — pinned by the spec equivalence test.
    */
  def replayBatches(
      batches: Seq[DataFrame],
      winnerCol: String,
      loserCol: String,
      rounds: Int = 5): DataFrame = {
    require(batches.nonEmpty, "replayBatches: need at least one batch")
    var pairs = emptyPairsLike(batches.head, winnerCol, loserCol)
    val steps = batches.zipWithIndex.map { case (b, i) =>
      val r = mergeAndRate(pairs, b, winnerCol, loserCol, rounds)
      pairs = r.pairs
      r.ratings.select(lit(i.toLong).as("batch_id"), col("item"),
        col("wins"), col("matches"), col("rating"), col("rank"))
    }
    steps.reduce(_.unionByName(_))
  }

  /** The streaming entry: `foreachBatch` merges each micro-batch's
    * duel counts and hands the post-merge ratings (with `batch_id`)
    * to `onBatch`. At-least-once guard: the pair-count merge is NOT
    * idempotent (re-merging double-counts), so the closure skips any
    * batch id it has already merged — the [[ContinualCounts]]
    * discipline.
    */
  def start(
      incoming: DataFrame,
      winnerCol: String,
      loserCol: String,
      rounds: Int = 5,
      queryName: String = "continual_preference")(
      onBatch: DataFrame => Unit): StreamingQuery =
    incoming.writeStream
      .queryName(queryName)
      .foreachBatch(batchStep(winnerCol, loserCol, rounds)(onBatch))
      .start()

  private[graft] def batchStep(
      winnerCol: String,
      loserCol: String,
      rounds: Int)(
      onBatch: DataFrame => Unit): (DataFrame, Long) => Unit = {
    var pairs: DataFrame = null
    var lastMerged = -1L
    (batch, batchId) =>
      if (batchId > lastMerged) {
        val base =
          if (pairs == null) emptyPairsLike(batch, winnerCol, loserCol)
          else pairs
        val r = mergeAndRate(base, batch, winnerCol, loserCol, rounds)
        pairs = r.pairs
        lastMerged = batchId
        onBatch(r.ratings.select(lit(batchId).as("batch_id"),
          col("item"), col("wins"), col("matches"), col("rating"),
          col("rank")))
      }
  }

  /** Typed empty accumulator: the pair table's item type is DERIVED
    * from the incoming batch's winner/loser columns rather than
    * hardcoded string — a stream whose items are e.g. bigint model
    * ids previously got silently string-coerced (or failed under
    * ANSI) at the first `unionByName` in [[mergeAndRate]], changing
    * the emitted item type versus the one-shot
    * [[graft.operators.Preference.bradleyTerry]].
    */
  private def emptyPairsLike(
      batch: DataFrame, winnerCol: String, loserCol: String): DataFrame =
    batch.limit(0).select(col(winnerCol).as("a"),
      col(loserCol).as("b"), lit(0L).as("n"))
}

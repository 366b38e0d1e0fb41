package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Materialize

/** Preference-data aggregation: pairwise comparison outcomes → per-item
  * strength ratings. The RLHF/eval half of a training-data pipeline:
  * human (or judge-model) A-vs-B verdicts arrive at corpus scale, and
  * what training needs back is a consistent per-item (model, policy,
  * prompt-source, annotator) quality scale.
  *
  * Scale shape: the item universe (models/policies being compared) is
  * small by construction while the duel table is row-scale. The ONLY
  * data-scale operation is the first hash aggregation (duels → per-pair
  * counts + per-item wins); every MM round after that runs on the
  * item-pair-cardinality table with broadcast weight joins — at 100 TB
  * of verdicts the iteration cost is unchanged.
  *
  * Numeric parity discipline (engine-portable across Spark/DuckDB):
  * per-pair MM terms floor-snap at 6 dp before the exact
  * decimal(38,6) sum (floor of an identical IEEE double is identical in
  * every engine — no round-half ties exist); per-round weights
  * floor-snap at 9 dp; sums of snapped values accumulate in decimal, so
  * parallel summation order cannot drift an ulp.
  */
object Preference {

  /** Bradley–Terry strength ratings from a duel (winner, loser) table
    * via `rounds` minorization-maximization updates
    * (Hunter 2004, "MM algorithms for generalized Bradley-Terry
    * models"): w_i ← W_i / Σ_j n_ij/(w_i+w_j), renormalized to mean 1
    * each round.
    *
    * Draws are the caller's contract: resolve them upstream (drop the
    * duel or split it) — rows with winner == loser are rejected here.
    * Items that never win converge toward `epsilon` (the clamp also
    * keeps never-winning pairs from dividing by zero).
    *
    * @return one row per item: item, wins, matches (duels involving the
    *         item), rating (mean-1 scale, 9 dp), rank (rating desc,
    *         item asc)
    */
  def bradleyTerry(
      duels: DataFrame, winnerCol: String, loserCol: String,
      rounds: Int = 5, epsilon: Double = 1e-9): DataFrame = {
    val d = duels.select(col(winnerCol).as("__w"), col(loserCol).as("__l"))
      .filter(col("__w").isNotNull && col("__l").isNotNull)
    // row-scale → item-pair scale, once
    val pair = d.filter(col("__w") =!= col("__l"))
      .groupBy(col("__w").as("a"), col("__l").as("b"))
      .agg(count(lit(1)).as("n"))
    bradleyTerryFromPairs(pair, rounds, epsilon)
  }

  /** [[bradleyTerry]] over pre-aggregated ORIENTED pair counts —
    * (a, b, n): a beat b, n times. The additive state shape a
    * continual service carries across batches
    * (`streaming.ContinualPreference`): pair counts merge by sum, and
    * ratings after any prefix equal the one-shot computation over that
    * prefix's duels.
    */
  def bradleyTerryFromPairs(
      pair: DataFrame, rounds: Int = 5,
      epsilon: Double = 1e-9): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds must be in [1,20]")
    require(epsilon > 0.0, "epsilon must be positive")
    val sym = Materialize.cut(
      pair.select(col("a"), col("b"), col("n"))
        .unionAll(pair.select(col("b").as("a"), col("a").as("b"), col("n")))
        .groupBy(col("a"), col("b")).agg(sum(col("n")).as("n")))
    val wins = pair.groupBy(col("a").as("item"))
      .agg(sum(col("n")).as("wins"))
    val matches = sym.groupBy(col("a").as("item"))
      .agg(sum(col("n")).as("matches"))
    val items = sym.select(col("a").as("item")).distinct()
    val k = items.agg(count(lit(1)).as("__k")) // 1 row, broadcast

    def floorDp(c: Column, dp: Int): Column = {
      val s = math.pow(10.0, dp.toDouble)
      floor(c * lit(s)) / lit(s)
    }

    var w = items.select(col("item"), lit(1.0).as("w"))
    for (_ <- 1 to rounds) {
      val denom = sym
        .join(broadcast(w.select(col("item").as("a"), col("w").as("__wa"))),
          Seq("a"))
        .join(broadcast(w.select(col("item").as("b"), col("w").as("__wb"))),
          Seq("b"))
        .select(col("a").as("item"),
          floorDp(col("n").cast("double") / (col("__wa") + col("__wb")),
            6).cast("decimal(38,6)").as("__t"))
        .groupBy(col("item")).agg(sum(col("__t")).as("__denom"))
      val unnorm = denom
        .join(broadcast(wins), Seq("item"), "left")
        .select(col("item"),
          greatest(floorDp(
            coalesce(col("wins"), lit(0L)).cast("double") /
              col("__denom").cast("double"), 9), lit(epsilon)).as("w"))
      val s = unnorm
        .agg(sum(col("w").cast("decimal(38,9)")).as("__s")) // 1 row
      w = unnorm.crossJoin(broadcast(s)).crossJoin(broadcast(k))
        .select(col("item"),
          greatest(floorDp(
            col("w") * col("__k").cast("double") /
              col("__s").cast("double"), 9), lit(epsilon)).as("w"))
      // per-round cut is LOAD-BEARING: round r's plan embeds w_{r-1}
      // TWICE (both broadcast sides) — uncut, each broadcast re-executes
      // the previous round independently and the re-execution tree grows
      // 2^rounds (measured: dropping this cut took q421 4.6 -> 157 s)
      w = Materialize.cut(w)
    }
    w.join(broadcast(wins), Seq("item"), "left")
      .join(broadcast(matches), Seq("item"), "left")
      .select(col("item"), coalesce(col("wins"), lit(0L)).as("wins"),
        col("matches"), col("w").as("rating"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rating").desc, col("item").asc)))
  }

  /** DPO/RLHF preference-pair construction: per prompt group, pair the
    * highest-scored response (chosen) against the lowest-scored
    * (rejected) — the best-vs-worst sampling that turns a scored
    * response pool into direct-preference training rows. Ties break on
    * the response id ascending (engine-portable); groups with fewer
    * than two responses, or where best and worst tie on score AND id
    * ordering would pair a row with itself, produce no pair.
    *
    * Scale shape: two ranking windows keyed by the prompt group — no
    * global ordering, no join; prompt groups partition freely at
    * corpus scale.
    *
    * @return one row per eligible group: group, chosen_id, chosen,
    *         rejected_id, rejected, chosen_score, rejected_score,
    *         score_gap
    */
  def dpoPairs(
      responses: DataFrame, groupCol: String, idCol: String,
      contentCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = responses.select(
      col(groupCol).as("group"), col(idCol).as("__id"),
      col(contentCol).as("__content"), col(scoreCol).as("__score"))
      .filter(col("__score").isNotNull)
    val best = Window.partitionBy(col("group"))
      .orderBy(col("__score").desc, col("__id").asc)
    val worst = Window.partitionBy(col("group"))
      .orderBy(col("__score").asc, col("__id").asc)
    base
      .withColumn("__rb", row_number().over(best))
      .withColumn("__rw", row_number().over(worst))
      .filter(col("__rb") === 1 || col("__rw") === 1)
      .groupBy(col("group"))
      .agg(
        max(when(col("__rb") === 1, struct(col("__id"), col("__content"),
          col("__score")))).as("__c"),
        max(when(col("__rw") === 1, struct(col("__id"), col("__content"),
          col("__score")))).as("__r"),
        count(lit(1)).as("__n"))
      .filter(col("__n") === 2) // a 1-response group tops both windows
      .select(col("group"),
        col("__c")("__id").as("chosen_id"),
        col("__c")("__content").as("chosen"),
        col("__r")("__id").as("rejected_id"),
        col("__r")("__content").as("rejected"),
        col("__c")("__score").as("chosen_score"),
        col("__r")("__score").as("rejected_score"),
        (col("__c")("__score") - col("__r")("__score")).as("score_gap"))
  }
}

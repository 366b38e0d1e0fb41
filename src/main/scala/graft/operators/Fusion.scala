package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for retrieval stacks — combining heterogeneous rankers
  * (exact cosine, quantized first-pass, BM25, recency) without score
  * calibration: reciprocal-rank fusion (Cormack et al., SIGIR'09)
  * scores each candidate Σ_r 1/(k + rank_r) over the rankers that
  * retrieved it, which rewards agreement while staying scale-free —
  * the standard first tool when two retrievers must become one list.
  */
object Fusion {

  /** RRF over a long-form rankings table (queryCol, docCol, rankerCol,
    * rankCol with rank >= 1). Each reciprocal term is rounded at 12
    * and accumulated in DECIMAL — order-independent across rankers and
    * partitions, so the fused scores are engine- and layout-exact.
    * Top `topN` docs per query by (score desc, doc) — the per-query
    * window runs over that query's candidate pool (the union of the
    * rankers' top lists), never the corpus.
    *
    * Output: (queryCol, docCol, n_rankers, rrf_score, fused_rank).
    */
  def rrfFuse(
      ranked: DataFrame,
      queryCol: String,
      docCol: String,
      rankerCol: String,
      rankCol: String,
      k: Int = 60,
      topN: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val term = round(lit(1.0d) / (lit(k.toDouble) + col(rankCol).cast("double")), 12)
      .cast("decimal(38,12)")
    val fused = ranked
      .filter(col(rankCol).isNotNull && col(rankCol) >= 1)
      .groupBy(col(queryCol), col(docCol))
      .agg(count(col(rankerCol)).as("n_rankers"),
        sum(term).as("__score"))
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col("__score").desc, col(docCol))
    fused
      .withColumn("fused_rank", row_number().over(w).cast("long"))
      .where(col("fused_rank") <= topN)
      .select(col(queryCol), col(docCol), col("n_rankers"),
        col("__score").cast("double").as("rrf_score"), col("fused_rank"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Neighborhood collaborative filtering: item-item cosine similarity
  * over binary user-item baskets, the classic "customers who bought X
  * also bought Y" recommender beside the factorization path
  * ([[Classify.alsRank1]]).
  *
  * With binary interactions the item vector is its user set, so
  *   cos(a, b) = |U_a ∩ U_b| / sqrt(|U_a| * |U_b|)
  * and co-counts come from a per-user self-join of baskets — the
  * standard Spark shape whose cost is sum_u |basket_u|^2, NOT
  * |items|^2. Two guards keep that sum bounded at scale:
  *   - `maxBasket` drops power users (a 10k-item basket contributes
  *     10^8 pairs and adds almost no signal — same reasoning as
  *     [[TextDedup]]'s boilerplate-shingle cut); dropped users are
  *     excluded from item degrees too, keeping the cosine consistent;
  *   - `minCo` prunes the long tail of single-co-occurrence pairs
  *     before the similarity math (and before the top-k shuffle).
  */
object Recommend {

  /** Undirected item pairs with co-count and cosine. Baskets dedup to
    * binary membership first; item degrees are counted over the SAME
    * capped population, so cosine stays <= 1 exactly.
    *
    * Output: item_a < item_b, co, n_a, n_b, cosine.
    */
  def itemItemCosine(
      df: DataFrame,
      userCol: String,
      itemCol: String,
      maxBasket: Int = 100,
      minCo: Long = 2L): DataFrame = {
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    val baskets = df.select(col(userCol).as("__u"), col(itemCol).as("__i"))
      .distinct()
    val kept = baskets
      .withColumn("__bs", count(lit(1)).over(Window.partitionBy(col("__u"))))
      .filter(col("__bs") <= maxBasket)
      .select(col("__u"), col("__i"))
    val degrees = kept.groupBy(col("__i")).agg(count(lit(1)).as("n"))
    val co = kept.as("a")
      .join(kept.as("b"), col("a.__u") === col("b.__u") &&
        col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("item_a"), col("b.__i").as("item_b"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
    co
      .join(degrees.select(col("__i").as("item_a"), col("n").as("n_a")),
        Seq("item_a"))
      .join(degrees.select(col("__i").as("item_b"), col("n").as("n_b")),
        Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("co"), col("n_a"), col("n_b"),
        (col("co").cast("double") /
          sqrt(col("n_a").cast("double") * col("n_b").cast("double")))
          .as("cosine"))
  }

  /** Per-item top-k neighbors, both directions of each undirected pair
    * (a recommendation list needs neighbors OF every item). Ties break
    * by neighbor id; cosine is rounded before ranking so a 1-ulp
    * cross-engine wobble cannot flip the cut.
    */
  def itemTopK(pairs: DataFrame, k: Int): DataFrame = {
    val directed = pairs.select(col("item_a").as("item"),
      col("item_b").as("neighbor"), round(col("cosine"), 10).as("cosine"),
      col("co"))
      .unionByName(pairs.select(col("item_b").as("item"),
        col("item_a").as("neighbor"), round(col("cosine"), 10).as("cosine"),
        col("co")))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("cosine").desc, col("neighbor"))
    directed.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}

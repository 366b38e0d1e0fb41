package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association measures between two categorical columns, emitted
  * PER CELL of the contingency table rather than as one scalar: a
  * float total over thousands of cells would accumulate in a
  * partition-order-dependent way, while per-cell contributions are
  * each ONE double expression over exact counts — deterministic,
  * hashable, and more useful (the analyst wants to know WHICH cells
  * drive the dependence, not just that χ² is large).
  *
  * Shape: one (a, b) hash aggregate for the cells, two marginal
  * aggregates derived FROM the cell table (tiny — at most the
  * categorical domain product), broadcast back onto it. The raw input
  * is scanned once.
  */
object Association {

  /** Contingency cells with marginals attached: n_ab, n_a, n_b, n. */
  private def cells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val ab = df.groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("n_ab"))
    val ma = ab.groupBy(col(aCol)).agg(sum(col("n_ab")).as("n_a"))
    val mb = ab.groupBy(col(bCol)).agg(sum(col("n_ab")).as("n_b"))
    val tot = ab.select(sum(col("n_ab")).as("n"))
    ab.join(broadcast(ma), Seq(aCol))
      .join(broadcast(mb), Seq(bCol))
      .crossJoin(broadcast(tot))
  }

  /** Pointwise mutual information per observed cell:
    * pmi = ln(n_ab · n / (n_a · n_b)). Positive cells co-occur more
    * than independence predicts. Also emits the cell's weighted MI
    * contribution (n_ab/n)·pmi — summing the column reproduces the
    * mutual information I(A;B).
    */
  def pmiCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val pmi = log(
      col("n_ab").cast("double") * col("n").cast("double")
        / (col("n_a").cast("double") * col("n_b").cast("double")))
    cells(df, aCol, bCol)
      .select(col(aCol), col(bCol), col("n_ab"), col("n_a"), col("n_b"),
        // round(12): Java Math.log and other libm lns disagree by an
        // ulp on some inputs — 12 digits is the cross-engine contract
        round(pmi, 12).as("pmi"),
        // round(12) guards the product's last ulp: an engine fusing
        // (a/n)·ln(x) with FMA lands one ulp off a strict two-step
        round(col("n_ab").cast("double") / col("n").cast("double") * pmi, 12)
          .as("mi_contrib"))
  }

  /** Mutual information I(A;B) in nats — the single-number feature
    * relevance score on top of [[pmiCells]]: each observed cell's
    * (n_ab/n)·pmi contribution is rounded at 12 (the cross-engine
    * double contract) and then accumulated in DECIMAL, so the sum is
    * order-independent and bit-identical on both engines without an
    * ordered fold. Zero cells contribute zero (the 0·ln 0 limit), so
    * summing observed cells IS the full MI. Output one row:
    * (n, n_cells, mi_nats).
    */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame =
    pmiCells(df, aCol, bCol)
      .agg(
        sum(col("n_ab")).as("n"),
        count(lit(1)).as("n_cells"),
        sum(col("mi_contrib").cast("decimal(38,12)")).cast("double")
          .as("mi_nats"))

  /** Normalized mutual information NMI(A;B) = I(A;B) / √(H(A)·H(B)) —
    * the standard clustering-vs-ground-truth agreement score (how
    * much does a community/cluster assignment tell you about a known
    * label, normalized off both side's entropies). Every count is
    * integer, every per-cell/per-class term is rounded at 12 (the ln
    * cross-engine contract) and accumulated in DECIMAL exactly like
    * [[mutualInformation]], and the one final normalization is a
    * fixed-form double expression floored at 1e-9. NMI is NULL when
    * either side has a single class (zero entropy — the score is
    * undefined, not 0 or 1). Output one row: (n, n_a_classes,
    * n_b_classes, mi_nats, h_a, h_b, nmi).
    */
  def normalizedMutualInformation(
      df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val mi = mutualInformation(df, aCol, bCol)
      .select(col("n"), col("mi_nats"))
    def entropy(cCol: String, nName: String, hName: String): DataFrame = {
      val m = df.groupBy(col(cCol)).agg(count(lit(1)).as("__m"))
      val tot = df.agg(count(lit(1)).as("__nt"))
      m.crossJoin(broadcast(tot))
        .select(round(
          col("__m").cast("double") / col("__nt").cast("double")
            * log(col("__nt").cast("double") / col("__m").cast("double")),
          12).cast("decimal(38,12)").as("__h"))
        .agg(count(lit(1)).cast("long").as(nName),
          sum(col("__h")).cast("double").as(hName))
    }
    mi.crossJoin(broadcast(entropy(aCol, "n_a_classes", "h_a")))
      .crossJoin(broadcast(entropy(bCol, "n_b_classes", "h_b")))
      .select(col("n"), col("n_a_classes"), col("n_b_classes"),
        round(col("mi_nats"), 12).as("mi_nats"),
        round(col("h_a"), 12).as("h_a"),
        round(col("h_b"), 12).as("h_b"),
        when(col("h_a") > 0 && col("h_b") > 0,
          floor(col("mi_nats") / sqrt(col("h_a") * col("h_b")) * 1e9)
            / 1e9).as("nmi"))
  }

  /** Market-basket association: for each unordered item pair, the
    * co-basket count and the LIFT n_ab·N/(n_a·n_b) (N = baskets;
    * lift > 1 = bought together more than independence predicts),
    * top-K by (lift, support) with deterministic item-pair
    * tie-breaks. The shelf-placement / cross-sell primitive.
    *
    * Shape: distinct (basket, item), basket-keyed self-join whose
    * fan-out is the per-basket item count squared (baskets are small;
    * a degenerate mega-basket is the caller's pre-filter), pair-keyed
    * aggregate, broadcast marginals, top-K via TakeOrdered.
    */
  def basketPairs(
      df: DataFrame, basketCol: String, itemCol: String,
      topK: Int): DataFrame = {
    require(topK >= 1)
    val bi = df.select(col(basketCol), col(itemCol)).distinct()
    // NOT "__N": Spark resolves column names case-insensitively by
    // default, so a total named __N would collide with the marginals'
    // __n after the joins
    val nBaskets = bi.select(countDistinct(col(basketCol)).as("__tot"))
    val marg = bi.groupBy(col(itemCol).as("__it"))
      .agg(count(lit(1)).as("__n"))
    val pairs = bi.as("a")
      .join(bi.as("b"), col(s"a.$basketCol") === col(s"b.$basketCol")
        && col(s"a.$itemCol") < col(s"b.$itemCol"))
      .groupBy(col(s"a.$itemCol").as("item_a"),
        col(s"b.$itemCol").as("item_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(marg).as("ma"), col("item_a") === col("ma.__it"))
      .join(broadcast(marg).as("mb"), col("item_b") === col("mb.__it"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_both"),
        col("ma.__n").as("n_a"), col("mb.__n").as("n_b"),
        (col("n_both").cast("double") * col("__tot").cast("double")
          / (col("ma.__n").cast("double") * col("mb.__n").cast("double")))
          .as("lift"))
      .orderBy(col("lift").desc, col("n_both").desc,
        col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** χ² independence-test contribution per observed cell:
    * expected = n_a·n_b/n, contrib = (n_ab − expected)²/expected.
    * (Cells with n_ab = 0 carry expected mass too; for sparse panels
    * sum the emitted contribs and add Σ expected over absent cells =
    * n − Σ_observed expected if the full statistic is needed.)
    */
  def chiSquareCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val expected = col("n_a").cast("double") * col("n_b").cast("double") /
      col("n").cast("double")
    cells(df, aCol, bCol)
      .select(col(aCol), col(bCol), col("n_ab"),
        expected.as("expected"),
        ((col("n_ab").cast("double") - expected)
          * (col("n_ab").cast("double") - expected) / expected)
          .as("chi2_contrib"))
  }
}

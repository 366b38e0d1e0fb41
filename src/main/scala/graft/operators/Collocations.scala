package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level collocation statistics: adjacent word-pair (bigram)
  * counts with pointwise mutual information, and per-document token
  * entropy — the vocabulary-facing half of training-data quality
  * analysis (PMI surfaces multi-word terms worth protecting from
  * tokenizer splits; low token entropy flags degenerate/repetitive
  * docs that Gopher-style filters drop).
  *
  * Scale shape: bigrams are generated IN-ROW (`transform` over the
  * token array — no self-join on position), and the explode feeds the
  * partial hash aggregate in the same codegen stage, so the only
  * shuffled rows are per-partition (w1, w2) partial counts. The two
  * unigram joins shuffle on the word key — the natural key, and the
  * count tables are vocabulary-sized, orders of magnitude smaller
  * than the corpus.
  */
object Collocations {

  /** Adjacent-pair counts with PMI over the whole corpus: one row per
    * (w1, w2) bigram with `n_pair >= minCount`, its unigram counts,
    * and pmi = ln(n_pair * n_tokens / (n_w1 * n_w2)) — integer-exact
    * operands, one double log, rounded to 12.
    */
  def adjacentPairsPmi(
      df: DataFrame, textCol: String, minCount: Long): DataFrame = {
    val toks = df.select(TextFunctions.tokens(col(textCol)).as("__toks"))
    val bigrams = toks
      .where(size(col("__toks")) >= 2)
      .select(explode(expr(
        """transform(sequence(0, size(__toks) - 2), k ->
          |  named_struct('w1', __toks[k], 'w2', __toks[k + 1]))""".stripMargin))
        .as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minCount)
    val unigrams = toks
      .select(explode(col("__toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val total = unigrams.agg(sum(col("n_w")).as("n_tokens"))
    bigrams
      .join(unigrams.withColumnRenamed("w", "w1").withColumnRenamed("n_w", "n_w1"), Seq("w1"))
      .join(unigrams.withColumnRenamed("w", "w2").withColumnRenamed("n_w", "n_w2"), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"), col("n_w2"),
        round(log(
          col("n_pair").cast("double") * col("n_tokens")
            / (col("n_w1").cast("double") * col("n_w2"))), 12).as("pmi"))
  }

  /** Per-document token entropy: H = -sum_w (c_w/n) ln(c_w/n), plus
    * the normalized form H / ln(n_distinct) (1.0 = uniform over the
    * doc's vocabulary; null for single-word docs). Each term is one
    * double expression cast to DECIMAL(30,18) and summed exactly, so
    * the per-doc sum is independent of aggregation order.
    */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = df
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col(idCol))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"))
    counts.join(totals, Seq(idCol))
      .withColumn("__term",
        ((col("c").cast("double") / col("n"))
          * log(col("c").cast("double") / col("n"))).cast("decimal(30,18)"))
      .groupBy(col(idCol), col("n"), col("n_distinct"))
      .agg((-sum(col("__term"))).cast("double").as("__h"))
      .select(col(idCol), col("n").as("n_tokens"), col("n_distinct"),
        round(col("__h"), 12).as("entropy"),
        round(col("__h") / nullif(log(col("n_distinct").cast("double")), lit(0.0)), 12)
          .as("norm_entropy"))
  }

  /** Skip-gram (center, context) pair extraction with word2vec
    * frequency subsampling (Mikolov et al., NeurIPS 2013),
    * derandomized — the training-pair generator for embedding models:
    *
    *   1. subsample: occurrence (doc, pos, w) SURVIVES when
    *      u(doc,pos,w) < sqrt(t/f) + t/f, where f is the word's corpus
    *      frequency and u is the md5-uniform of "doc:pos:w" in [0,1) —
    *      the word2vec keep rule with the library's content-hash
    *      Gumbel discipline instead of `rand()` (replays exactly in
    *      any engine);
    *   2. re-index survivors per document (row_number by original
    *      position) so context windows SPAN deletions — dropping a
    *      stopword brings its neighbors together, the word2vec
    *      semantic;
    *   3. pair: for each survivor, contexts at re-indexed distance
    *      1..window via an equi-join on (doc, new_pos + offset) — no
    *      range condition, plain hash join;
    *   4. aggregate to (center, context, n_pairs).
    *
    * Scale shape: one explode + vocabulary-sized frequency join, one
    * window re-rank partitioned by doc, one offset-exploded equi-join
    * on (doc, pos) — tokens, ids and counts only through every
    * shuffle; output is vocabulary^2-bounded, cut by `minCount`.
    */
  def skipgramPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 2,
      sampleT: Double = 1e-3,
      minCount: Long = 1L): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(sampleT > 0, s"sampleT must be > 0, got $sampleT")
    val tok = df
      .select(col(idCol).as("__doc"),
        posexplode(TextFunctions.tokens(col(textCol))))
      .select(col("__doc"), col("pos").as("__p"), col("col").as("__w"))
      .where(col("__w") =!= "")
    val freq = tok.groupBy(col("__w")).agg(count(lit(1)).as("__n"))
    val total = freq.agg(sum(col("__n")).as("__tot"))
    val keepP = {
      val f = col("__n").cast("double") / col("__tot").cast("double")
      least(lit(1.0d), sqrt(lit(sampleT) / f) + lit(sampleT) / f)
    }
    val u = TextFunctions.md5Hash60(
      concat_ws(":", col("__doc"), col("__p"), col("__w")))
      .cast("double") / lit(math.pow(2.0, 60))
    val survivors = tok
      .join(freq, Seq("__w"))
      .crossJoin(broadcast(total))
      .where(u < keepP)
      .withColumn("__np", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__doc")).orderBy(col("__p"))))
      .select(col("__doc"), col("__np"), col("__w"))
    val centers = survivors
      .select(col("__doc"), col("__np"), col("__w").as("center"),
        explode(sequence(lit(1), lit(window))).as("__off"))
    val ctx = survivors
      .select(col("__doc").as("__cdoc"), col("__np").as("__cp"),
        col("__w").as("context"))
    // symmetric window via both join directions on (doc, np +- off)
    val right = centers
      .join(ctx, col("__doc") === col("__cdoc") &&
        col("__np") + col("__off") === col("__cp"))
      .select(col("center"), col("context"))
    val left = centers
      .join(ctx, col("__doc") === col("__cdoc") &&
        col("__np") - col("__off") === col("__cp"))
      .select(col("center"), col("context"))
    right.unionByName(left)
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("n_pairs"))
      .where(col("n_pairs") >= minCount)
  }
}

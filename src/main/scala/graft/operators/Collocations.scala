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
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer-artifact persistence — the train-once / tokenize-
  * everywhere split for the tokenization family, mirroring
  * [[Similarity.saveIndex]] for ANN: a BPE merge table
  * ([[TextAnalysis.phraseMergeTable]] / [[TextAnalysis.bpeMerges]])
  * or a unigram vocabulary ([[TextAnalysis.unigramEmTrain]] /
  * [[TextAnalysis.unigramHardEmRound]]) is trained ONCE, written as
  * parquet, and every downstream corpus pass loads the artifact
  * instead of re-deriving it — at 100 TB, training reads a sample
  * while apply reads everything, so fusing them (the pre-round-10
  * q371 shape: re-train + collect per run) repays the training cost
  * on every query.
  *
  * Parquet round-trips longs, strings, and doubles bit-exactly, so a
  * loaded artifact reproduces the fresh one row-for-row
  * (rebuild-equivalence is spec-pinned in TokenizerStoreSpec and
  * oracle-pinned by harness q401/q402 sharing their source queries'
  * oracles verbatim).
  */
object TokenizerStore {

  /** Persist a (rank, merge_left, merge_right, pair_count) merge
    * table.
    */
  def saveMergeTable(merges: DataFrame, path: String): Unit =
    merges
      .select(col("rank"), col("merge_left"), col("merge_right"),
        col("pair_count"))
      .write.mode("overwrite").parquet(path + "/merges")

  /** Load a persisted merge table (see [[saveMergeTable]]). */
  def loadMergeTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path + "/merges")

  /** The merge table as rank-ordered (left, right) pairs — the shape
    * [[TextAnalysis.bpePhraseEncode]]/[[TextAnalysis.bpeEncode]]
    * bind into the codegen'd merge loop. The table is vocab-bounded
    * metadata (≤ a few thousand rows) by construction; collecting it
    * is the artifact READ, not a data-plane collect.
    */
  def loadMergePairs(
      spark: SparkSession, path: String): Seq[(String, String)] =
    loadMergeTable(spark, path)
      .orderBy(col("rank"))
      .select(col("merge_left"), col("merge_right"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1)))

  /** Persist a (piece, cnt, lp) unigram vocabulary. */
  def saveUnigramVocab(vocab: DataFrame, path: String): Unit =
    vocab.select(col("piece"), col("cnt"), col("lp"))
      .write.mode("overwrite").parquet(path + "/unigram_vocab")

  /** Load a persisted unigram vocabulary (see [[saveUnigramVocab]]);
    * feed it to [[TextAnalysis.unigramSegmentWith]].
    */
  def loadUnigramVocab(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path + "/unigram_vocab")

  /** Persist a (piece, cnt) WordPiece vocabulary in surface form
    * (`##` continuations) — [[TextAnalysis.wordpieceVocab]] output.
    */
  def saveWordpieceVocab(vocab: DataFrame, path: String): Unit =
    vocab.select(col("piece"), col("cnt"))
      .write.mode("overwrite").parquet(path + "/wordpiece_vocab")

  /** Load a persisted WordPiece vocabulary (see
    * [[saveWordpieceVocab]]); feed it to
    * [[TextAnalysis.wordpieceSegmentWith]].
    */
  def loadWordpieceVocab(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path + "/wordpiece_vocab")

  /** Persist a trained bigram LM ([[TextAnalysis.trainBigramLm]]):
    * unigram and bigram count tables — the CCNet-filter artifact
    * (train on the clean reference once, score every corpus pass via
    * [[TextAnalysis.bigramLogProbWith]]). Counts are longs; parquet
    * round-trips them bit-exactly, so a loaded LM scores identically
    * to a fresh one.
    */
  def saveBigramLm(lm: TextAnalysis.BigramLm, path: String): Unit = {
    lm.unigrams.select(col("term"), col("uc"))
      .write.mode("overwrite").parquet(path + "/lm_unigrams")
    lm.bigrams.select(col("w1"), col("w2"), col("bc"))
      .write.mode("overwrite").parquet(path + "/lm_bigrams")
  }

  /** Load a persisted bigram LM (see [[saveBigramLm]]). */
  def loadBigramLm(spark: SparkSession, path: String): TextAnalysis.BigramLm =
    TextAnalysis.BigramLm(
      spark.read.parquet(path + "/lm_unigrams"),
      spark.read.parquet(path + "/lm_bigrams"))
}

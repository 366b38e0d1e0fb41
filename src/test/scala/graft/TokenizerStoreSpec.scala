package graft

import graft.operators.{TextAnalysis, TokenizerStore}
import org.apache.spark.sql.functions._

class TokenizerStoreSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "the cat sat on the mat",
    "the cat ran to the mat",
    "a dog sat on a log",
    "the dog and the cat").map(Tuple1(_)).toDF("text")

  private def tmp(name: String): String =
    new java.io.File(sys.props("java.io.tmpdir"), name).getAbsolutePath

  test("merge table: save/load round-trips rows exactly; encoding " +
    "with the loaded table equals encoding with the fresh one") {
    val fresh = TextAnalysis.phraseMergeTable(docs, "text", 32)
    val path = tmp("graft_spec_bpe_store")
    TokenizerStore.saveMergeTable(fresh, path)

    val loaded = TokenizerStore.loadMergeTable(spark, path)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("merge_left"),
        r.getAs[String]("merge_right"), r.getAs[Long]("pair_count")))
    val want = fresh.orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("merge_left"),
        r.getAs[String]("merge_right"), r.getAs[Long]("pair_count")))
    assert(loaded.toSeq === want.toSeq)

    val withDocs = docs.withColumn("id",
      monotonically_increasing_id())
    val freshPairs = fresh.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val e1 = TextAnalysis.bpePhraseEncode(withDocs, "text", "id",
      freshPairs).orderBy("id").collect().map(_.toSeq)
    val e2 = TextAnalysis.bpePhraseEncode(withDocs, "text", "id",
      TokenizerStore.loadMergePairs(spark, path))
      .orderBy("id").collect().map(_.toSeq)
    assert(e1.toSeq === e2.toSeq)
  }

  test("unigram vocab: save/load round-trips; segmentWith(loaded) " +
    "equals segmentWith(fresh)") {
    val vocab = TextAnalysis.unigramHardEmRound(docs, "text",
      maxPieceLen = 3, vocabSize = 20, maxWordLen = 8)
    val path = tmp("graft_spec_unigram_store")
    TokenizerStore.saveUnigramVocab(vocab, path)
    val loaded = TokenizerStore.loadUnigramVocab(spark, path)

    val vRows = vocab.orderBy("piece").collect().map(_.toSeq)
    val lRows = loaded.orderBy("piece").collect().map(_.toSeq)
    assert(lRows.toSeq === vRows.toSeq)

    val s1 = TextAnalysis.unigramSegmentWith(docs, "text", vocab,
      maxPieceLen = 3, maxWordLen = 8)
      .orderBy("word").collect().map(_.toSeq)
    val s2 = TextAnalysis.unigramSegmentWith(docs, "text", loaded,
      maxPieceLen = 3, maxWordLen = 8)
      .orderBy("word").collect().map(_.toSeq)
    assert(s1.toSeq === s2.toSeq)
    assert(s1.nonEmpty)
  }

  test("unigramSegmentWith: explicit vocab drives the DP (a vocab " +
    "with only single chars forces per-char segmentation)") {
    val oneDoc = Seq(Tuple1("abc ab")).toDF("text")
    val chars = Seq(("a", 1L, -1.0), ("b", 1L, -1.0), ("c", 1L, -1.0))
      .toDF("piece", "cnt", "lp")
    val got = TextAnalysis.unigramSegmentWith(oneDoc, "text", chars)
      .collect().map(r => r.getAs[String]("word") ->
        (r.getAs[Double]("best_lp"), r.getAs[Int]("n_pieces"))).toMap
    assert(got("abc") === ((-3.0, 3)))
    assert(got("ab") === ((-2.0, 2)))
    // a richer vocab with the whole word wins over char-by-char
    val rich = chars.unionByName(
      Seq(("abc", 1L, -0.5)).toDF("piece", "cnt", "lp"))
    val got2 = TextAnalysis.unigramSegmentWith(oneDoc, "text", rich)
      .collect().map(r => r.getAs[String]("word") ->
        (r.getAs[Double]("best_lp"), r.getAs[Int]("n_pieces"))).toMap
    assert(got2("abc") === ((-0.5, 1)))
  }

  test("WordPiece vocab round-trips parquet; loaded vocab reproduces " +
    "the fresh segmentation row-for-row") {
    val docs = Seq("the cat sat", "the cat ran", "a hat").toDF("text")
    val fresh = TextAnalysis.wordpieceVocab(docs, "text", vocabSize = 12)
    val path = tmp("graft_spec_wordpiece_store")
    TokenizerStore.saveWordpieceVocab(fresh, path)
    val loaded = TokenizerStore.loadWordpieceVocab(spark, path)
    assert(loaded.orderBy("piece").collect().toSeq ===
      fresh.orderBy("piece").collect().toSeq)
    val a = TextAnalysis.wordpieceSegmentWith(docs, "text", fresh)
      .orderBy("word").collect().toSeq
    val b = TextAnalysis.wordpieceSegmentWith(docs, "text", loaded)
      .orderBy("word").collect().toSeq
    assert(a === b)
  }

  test("bigram LM: counts round-trip parquet; scoring with the loaded " +
    "LM equals the one-call train-plus-score form") {
    val withIds = docs.withColumn("id", monotonically_increasing_id())
    val lm = TextAnalysis.trainBigramLm(docs, "text")
    val path = tmp("graft_spec_bigram_lm")
    TokenizerStore.saveBigramLm(lm, path)
    val loaded = TokenizerStore.loadBigramLm(spark, path)
    assert(loaded.unigrams.orderBy("term").collect().map(_.toSeq).toSeq ===
      lm.unigrams.orderBy("term").collect().map(_.toSeq).toSeq)
    assert(loaded.bigrams.orderBy("w1", "w2").collect().map(_.toSeq).toSeq ===
      lm.bigrams.orderBy("w1", "w2").collect().map(_.toSeq).toSeq)
    val oneCall = TextAnalysis.bigramLogProb(withIds, docs, "text", "id")
      .orderBy("id").collect().map(_.toSeq)
    val viaLoaded = TextAnalysis.bigramLogProbWith(withIds, loaded,
      "text", "id").orderBy("id").collect().map(_.toSeq)
    assert(viaLoaded.toSeq === oneCall.toSeq)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  private def vocabDf(pieces: String*) =
    pieces.toDF("piece")

  private def segment(text: String, vocab: Seq[String]) =
    TextAnalysis.wordpieceSegmentWith(
      Seq(text).toDF("text"), "text", vocabDf(vocab: _*))
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(2), r.getInt(3), r.getString(4))).toMap

  test("greedy longest-match-first: longest piece wins at each position") {
    val got = segment("abcd", Seq("ab", "##cd", "a", "##bc", "##d"))
    assert(got("abcd") === ((false, 2, "ab ##cd")))
  }

  test("no match at a position makes the whole word [UNK]") {
    val got = segment("xyz", Seq("x", "##y"))
    assert(got("xyz") === ((true, 0, "[UNK]")))
  }

  test("greedy is not Viterbi: a longest-first dead end UNKs a " +
    "segmentable word") {
    // "a ##bcd" segments the word, but greedy commits to "ab" first
    // and dies at position 2 — the defining WordPiece-vs-unigram
    // behavior difference.
    val got = segment("abcd", Seq("ab", "a", "##bcd"))
    assert(got("abcd") === ((true, 0, "[UNK]")))
  }

  test("single-piece word; continuation form is required word-interior") {
    // bare "b" in the vocab does NOT match at interior positions
    val got = segment("bb", Seq("b"))
    assert(got("bb") === ((true, 0, "[UNK]")))
    val ok = segment("bb", Seq("b", "##b"))
    assert(ok("bb") === ((false, 2, "b ##b")))
  }

  test("wordpieceVocab: frequency-weighted surface forms, " +
    "deterministic tie-break") {
    val corpus = Seq("aa aa b").toDF("text")
    val v = TextAnalysis.wordpieceVocab(corpus, "text", vocabSize = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // candidates: a/aa/##a each weight 2, b weight 1; ties break
    // piece-ascending so the top 3 are ##a, a, aa
    assert(v === Map("##a" -> 2L, "a" -> 2L, "aa" -> 2L))

    val seg = TextAnalysis.wordpieceSegment(corpus, "text", vocabSize = 3)
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(2), r.getInt(3), r.getString(4))).toMap
    assert(seg("aa") === ((false, 1, "aa")))
    assert(seg("b") === ((true, 0, "[UNK]"))) // b fell out of the vocab
  }

  test("pretokenCounts: GPT-2 splits — contractions, space-prefixed " +
    "runs, Ġ rendering") {
    val df = Seq((1L, "I don't like 42 bugs!  I don't")).toDF("id", "text")
    val got = TextAnalysis.pretokenCounts(df, "text", "id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "don" carries the leading space -> Ġdon; the contraction "'t"
    // splits off; "42" is a digit run; "!" a punctuation run. The
    // lookahead-free core (unlike full GPT-2's `\s+(?!\S)`) lets the
    // greedy \s+ swallow BOTH spaces of the double space, so the
    // second "I" splits bare — pinned here as the documented delta.
    assert(got("I") === 2L)
    assert(got("Ġdon") === 2L)
    assert(got("'t") === 2L)
    assert(got("Ġ42") === 1L)
    assert(got("!") === 1L)
    assert(got("ĠĠ") === 1L)
    assert(!got.contains("ĠI"))
    assert(got("Ġlike") === 1L && got("Ġbugs") === 1L)
    // tokens re-concatenate to the original text (split is lossless)
    val total = got.toSeq.map { case (t, n) =>
      t.replace("Ġ", " ").length * n }.sum
    assert(total === "I don't like 42 bugs!  I don't".length)
  }

  test("wordpieceCoverage: occurrence-weighted OOV and fertility per " +
    "group; overlong words count as one [UNK]") {
    val docs = Seq(
      ("s1", "abc abc zz"),            // abc = ab ##c (2 pieces), zz OOV
      ("s2", "abc " + "y" * 20))       // overlong word -> UNK, 1 piece
      .toDF("source", "text")
    val out = TextAnalysis.wordpieceCoverage(docs, "text", "source",
      vocabDf("ab", "##c"))
      .orderBy("group_key").collect()
    val s1 = out(0)
    assert(s1.getAs[Long]("n_words") === 3L)
    assert(s1.getAs[Long]("n_unk") === 1L)
    assert(s1.getAs[Double]("oov_rate") === (1.0 / 3 * 1e12).round / 1e12)
    // pieces: 2 + 2 + 1 = 5 over 3 words
    assert(s1.getAs[Double]("mean_pieces") === (5.0 / 3 * 1e12).round / 1e12)
    val s2 = out(1)
    assert(s2.getAs[Long]("n_words") === 2L)
    assert(s2.getAs[Long]("n_unk") === 1L)
    assert(s2.getAs[Double]("mean_pieces") === 1.5)
  }

  test("wordpieceTokenCounts: per-document piece totals; UNK and " +
    "overlong words count 1 (the coverage/mask convention)") {
    val docs = Seq(
      (1L, "abc abc zz"),            // 2 + 2 + 1(UNK) = 5
      (2L, "abc " + "y" * 20))       // 2 + 1(overlong UNK) = 3
      .toDF("doc_id", "text")
    val out = TextAnalysis.wordpieceTokenCounts(docs, "text", "doc_id",
      vocabDf("ab", "##c"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 5L, 2L -> 3L))
  }

  test("words beyond maxWordLen are excluded from the output") {
    val out = TextAnalysis.wordpieceSegmentWith(
      Seq("short " + "x" * 20).toDF("text"), "text",
      vocabDf("short"), maxPieceLen = 6, maxWordLen = 16)
      .collect()
    assert(out.map(_.getString(0)).toSeq === Seq("short"))
    assert(out.head.getInt(3) === 1)
  }
}

package graft

import graft.operators.TextAnalysis

/** PII redaction, token chunking, vocab stats — edge-case pins. */
class TextPrepSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii: counts and replaces emails and urls, no-op otherwise") {
    val df = Seq(
      (1L, "mail me at a.b@test.org or see https://x.io/path?q=1 now"),
      (2L, "nothing to scrub here"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(df, "text")
      .orderBy($"doc_id").collect()
    assert(got(0).getAs[Long]("n_emails") === 1)
    assert(got(0).getAs[Long]("n_urls") === 1)
    assert(got(0).getAs[String]("redacted") ===
      "mail me at <EMAIL> or see <URL> now")
    assert(got(1).getAs[Long]("n_emails") === 0)
    assert(got(1).getAs[String]("redacted") === "nothing to scrub here")
  }

  test("redactPii is case-insensitive") {
    val df = Seq((1L, "John.Doe@Example.COM and HTTPS://X.IO/P"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df, "text").head()
    assert(r.getAs[Long]("n_emails") === 1)
    assert(r.getAs[Long]("n_urls") === 1)
    assert(r.getAs[String]("redacted") === "<EMAIL> and <URL>")
  }

  test("chunkTokens: boundaries at exactly size, size+1, and short docs") {
    def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, doc(50)),   // exactly one chunk
      (2L, doc(51)),   // two chunks; second = tokens 41..51 (11 tokens)
      (3L, doc(5)),    // short: one 5-token chunk
      (4L, doc(90)))   // starts 0,40: chunks 50 + 50
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkTokens(df, "text", "doc_id", 50, 10)
      .orderBy($"doc_id", $"chunk_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.count(_._1 == 1L) === 1)
    assert(got.filter(_._1 == 2L).map(_._3).toSeq === Seq(50L, 11L))
    assert(got.filter(_._1 == 3L).map(_._3).toSeq === Seq(5L))
    assert(got.filter(_._1 == 4L).map(_._3).toSeq === Seq(50L, 50L))
    // overlap: chunk 1 of doc 2 starts at token 41
    val c1 = TextAnalysis.chunkTokens(df.filter($"doc_id" === 2L),
      "text", "doc_id", 50, 10)
      .filter($"chunk_idx" === 1L).head().getAs[String]("chunk_text")
    assert(c1.startsWith("w41 "))
    assert(c1.endsWith(" w51"))
  }

  test("fuzzy self-join finds pairs straddling a length-band boundary") {
    // band=8: len 7 ("abcdefg") is band 0, len 9 ("abcdefgxy") band 1 —
    // distance 2, found only because the probe side fans out to both
    val df = Seq(
      (1L, "abcdefg"),      // len 7
      (2L, "abcdefgxy"),    // len 9, dist 2 from id 1
      (3L, "zzzzzzz"),      // len 7, far from everything
      (4L, "abcdefgx"))     // len 8, dist 1 from id 1, dist 1 from id 2
      .toDF("id", "s")
    val got = graft.operators.FuzzyJoin
      .levenshteinSelfJoin(df, "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 2L), (1L, 4L, 1L), (2L, 4L, 1L)))
  }

  test("fuzzy self-join: edits at segment boundaries, tiny strings, exacts") {
    val df = Seq(
      (1L, "abcdefghij"),   // baseline, len 10
      (2L, "Xbcdefghij"),   // sub in segment 0
      (3L, "abcdXfghij"),   // sub in segment 1
      (4L, "abcdefghiX"),   // sub in segment 2
      (5L, "bcdefghij"),    // deletion at front (shifts all segments)
      (6L, "abcdefghijXY"), // two inserts at end
      (7L, ""),             // empty
      (8L, "ab"),           // tiny
      (9L, "abcdefghij"))   // exact duplicate of 1
      .toDF("id", "s")
    val got = graft.operators.FuzzyJoin
      .levenshteinSelfJoin(df, "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every row 2-6 and 9 is within distance 2 of row 1
    for (other <- Seq(2L, 3L, 4L, 5L, 6L, 9L))
      assert(got.contains((1L, other)), s"missing (1,$other)")
    assert(got.contains((7L, 8L))) // "" vs "ab" = dist 2, tiny channel
    assert(!got.exists(p => p._1 == 7L && p._2 == 9L))
  }

  test("vocabStats: type-token ratio with repeats") {
    val df = Seq((1L, "a b a c a b")).toDF("doc_id", "text")
    val r = TextAnalysis.vocabStats(df, "text", "doc_id").head()
    assert(r.getAs[Long]("n_tokens") === 6)
    assert(r.getAs[Long]("n_types") === 3)
    assert(r.getAs[Double]("ttr") === 0.5)
  }

  test("packSequences shards=1: the serial degenerate case packs one global stream") {
    // token counts (4,3,5,2,6), target 8: running ends 4,7,12,14,20 ->
    // first-token offsets 0,4,7,12,14 -> bins 0,0,0,1,1
    val df = Seq((1L, 4L), (2L, 3L), (3L, 5L), (4L, 2L), (5L, 6L))
      .toDF("doc_id", "n_tokens")
    val got = TextAnalysis
      .packSequences(df, "doc_id", "n_tokens", targetTokens = 8, shards = 1)
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"))).toSet
    assert(got === Set((0L, 0L, 3L, 12L), (0L, 1L, 2L, 8L)))
    assertThrows[IllegalArgumentException] {
      TextAnalysis.packSequences(df, "doc_id", "n_tokens", 8, shards = 0)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Multimodal, TextAnalysis, TextDedup}
import graft.pipeline.WarcPipeline

class WarcPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def mediaRow(id: Long, text: String): Multimodal.MediaRow = {
    val html = "<p>" + text + "</p>"
    val ok = "HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n\r\n" + html
    Multimodal.MediaRow(id,
      Multimodal.gzipMembersBytes(Seq(
        Multimodal.warcBytesRaw(Seq(("response", s"https://d$id/", ok))),
        Multimodal.warcBytesRaw(Seq(("request", s"https://d$id/", ""))))),
      "application/warc", -1, -1)
  }

  test("end to end: extraction, quality/language gate, index dedup " +
    "and packing each claim exactly their rows; the audit explains it") {
    val enDup = "the quick brown fox jumps over the lazy dog today"
    val enNew = "a fresh page of perfectly ordinary words for the corpus"
    val corpus = Seq((1L, enDup)).toDF("doc_id", "text")
    val media = Seq(
      mediaRow(10L, enDup),  // near-dup of corpus doc 1 -> dropped
      mediaRow(11L, enNew),  // survives all gates -> packed
      mediaRow(12L, "tiny line"), // < 15 chars -> extraction drops
      mediaRow(13L,          // de stopwords outvote en -> lang gate
        "the und der das ist nicht ein mit good words here today")
    ).toDS()
    val vocab = TextAnalysis.wordpieceVocab(
      corpus.unionByName(Seq((11L, enNew)).toDF("doc_id", "text")),
      "text")
    val index = TextDedup.buildMinhashIndex(corpus, "text", "doc_id",
      hashFn = TextFunctions.fastHash)
    val res = WarcPipeline.run(media, index, vocab)
    assert(res.audit === Seq("media" -> 4L, "extracted" -> 3L,
      "gated" -> 2L, "survivors" -> 1L, "packs" -> 1L))
    assert(res.kept.select("media_id").as[Long].collect().toSeq ===
      Seq(11L))
    val pack = res.packs.collect().head
    assert(pack.getAs[Long]("n_convs") === 1L)
    assert(pack.getAs[String]("text") === enNew)
    // pack token total equals the per-doc count under the same vocab
    val expected = TextAnalysis.wordpieceTokenCounts(
      Seq((11L, enNew)).toDF("doc_id", "text"), "text", "doc_id", vocab)
      .collect().head.getLong(1)
    assert(pack.getAs[Long]("packed_tokens") === expected)
  }

  test("withAudit = false skips the stage counts but returns the " +
    "same packs") {
    val text = "a plain page of the simplest possible words for this test"
    val media = Seq(mediaRow(20L, text)).toDS()
    val vocab = TextAnalysis.wordpieceVocab(
      Seq((20L, text)).toDF("doc_id", "text"), "text")
    val index = TextDedup.buildMinhashIndex(
      Seq((1L, "completely different content lives here now today ok"))
        .toDF("doc_id", "text"),
      "text", "doc_id", hashFn = TextFunctions.fastHash)
    val res = WarcPipeline.run(media, index, vocab, withAudit = false)
    assert(res.audit.isEmpty)
    val pack = res.packs.collect().head
    assert(pack.getAs[String]("text") === text)
  }
}

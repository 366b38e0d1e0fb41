package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chat, TextAnalysis}
import graft.pipeline.SftPipeline

class SftPipelineSpec extends SparkSpec {
  import spark.implicits._

  // four conversations, one per planted malformation plus one clean:
  //   1 clean u/a        -> renders, masks, packs
  //   2 double-assistant -> lint bad_alternations
  //   3 empty content    -> lint empty_turns
  //   4 all-user         -> lint no_assistant
  private val turns = Seq(
    (1L, 1, "user", "hello there friend"),
    (1L, 2, "assistant", "general reply text"),
    (2L, 1, "assistant", "first reply"),
    (2L, 2, "assistant", "second reply"),
    (3L, 1, "user", "   "),
    (3L, 2, "assistant", "answer"),
    (4L, 1, "user", "only a question"),
    (4L, 2, "user", "and another question"))
    .toDF("conv_id", "idx", "role", "content")

  private val vocab = TextAnalysis.wordpieceVocab(
    Seq("hello there friend general reply text").toDF("text"), "text")

  test("end to end: the lint gate drops every malformed conversation, " +
    "the clean one renders/masks/packs, and the audit explains it") {
    val res = SftPipeline.run(turns, vocab, "conv_id", "idx", "role",
      "content", SftPipeline.SftPipelineConfig(targetTokens = 50))
    assert(res.audit === Seq("turns" -> 8L, "valid_convs" -> 1L,
      "rendered" -> 1L, "masked" -> 1L, "packs" -> 1L))
    val mask = res.masks.collect().head
    assert(mask.getAs[Long]("conv_id") === 1L)
    // the pack is exactly conversation 1's mask rows, offsets unmoved
    // (single conversation in the bin -> token offset 0)
    val pack = res.packs.collect().head
    assert(pack.getAs[Long]("n_convs") === 1L)
    assert(pack.getAs[Long]("packed_tokens") ===
      mask.getAs[Long]("n_tokens"))
    assert(pack.getAs[String]("token_ids") ===
      mask.getAs[String]("token_ids"))
    assert(pack.getAs[String]("token_mask_spans") ===
      mask.getAs[String]("token_mask_spans"))
  }

  test("the pipeline equals its stages composed by hand on the gated " +
    "subset") {
    val clean = turns.filter(col("conv_id") === 1L)
    val convs = Chat.chatTemplate(clean, "conv_id", "idx", "role",
      "content")
    val expected = Chat.packTokenMasks(convs,
      Chat.tokenLossMask(convs, vocab), targetTokens = 50, shards = 8)
      .collect().toSeq
    val got = SftPipeline.run(turns, vocab, "conv_id", "idx", "role",
      "content", SftPipeline.SftPipelineConfig(targetTokens = 50),
      withAudit = false).packs.collect().toSeq
    assert(got === expected)
  }

  test("withAudit = false skips the stage counts but returns the " +
    "same packs") {
    val res = SftPipeline.run(turns, vocab, "conv_id", "idx", "role",
      "content", withAudit = false)
    assert(res.audit.isEmpty)
    assert(res.packs.count() === 1L)
  }
}

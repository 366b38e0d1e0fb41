package graft

import graft.operators.Chat

class ChatSpec extends SparkSpec {
  import spark.implicits._

  test("rendered text, hand-computed mask spans, per-role stats") {
    val turns = Seq(
      (1L, 1, "user", "hi"), (1L, 2, "assistant", "yo!"),
      (1L, 3, "user", "ok"), (1L, 4, "assistant", "bye"))
      .toDF("conv_id", "idx", "role", "content")
    val r = Chat.chatTemplate(turns, "conv_id", "idx", "role", "content")
      .collect().head
    assert(r.getAs[String]("text") ===
      "<|user|>hi\n<|assistant|>yo!\n<|user|>ok\n<|assistant|>bye")
    assert(r.getAs[Long]("n_turns") === 4L)
    assert(r.getAs[Long]("n_user_turns") === 2L)
    assert(r.getAs[Long]("n_assistant_turns") === 2L)
    assert(r.getAs[Long]("total_chars") === 55L)
    assert(r.getAs[Long]("assistant_chars") === 6L)
    assert(r.getAs[String]("mask_spans") === "24:27;52:55")
    // the spans must slice exactly the assistant contents
    val text = r.getAs[String]("text")
    assert(text.substring(24, 27) === "yo!")
    assert(text.substring(52, 55) === "bye")
  }

  test("no assistant turn: empty mask, zero loss chars") {
    val turns = Seq((7L, 1, "user", "alone"))
      .toDF("conv_id", "idx", "role", "content")
    val r = Chat.chatTemplate(turns, "conv_id", "idx", "role", "content")
      .collect().head
    assert(r.getAs[String]("mask_spans") === "")
    assert(r.getAs[Long]("assistant_chars") === 0L)
    assert(r.getAs[Long]("n_user_turns") === 1L)
  }

  test("turn order comes from idx, not input row order") {
    val turns = Seq(
      (1L, 2, "assistant", "second"), (1L, 1, "user", "first"))
      .toDF("conv_id", "idx", "role", "content")
    val r = Chat.chatTemplate(turns, "conv_id", "idx", "role", "content")
      .collect().head
    assert(r.getAs[String]("text") ===
      "<|user|>first\n<|assistant|>second")
    val Array(s, e) = r.getAs[String]("mask_spans").split(":").map(_.toInt)
    assert(r.getAs[String]("text").substring(s, e) === "second")
  }

  test("custom assistant role name") {
    val turns = Seq(
      (1L, 1, "human", "q"), (1L, 2, "bot", "a"))
      .toDF("conv_id", "idx", "role", "content")
    val r = Chat.chatTemplate(turns, "conv_id", "idx", "role", "content",
      assistantRole = "bot").collect().head
    assert(r.getAs[Long]("n_assistant_turns") === 1L)
    val Array(s, e) = r.getAs[String]("mask_spans").split(":").map(_.toInt)
    assert(r.getAs[String]("text").substring(s, e) === "a")
  }
}

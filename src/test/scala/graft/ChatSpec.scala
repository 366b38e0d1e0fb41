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

  test("packConversations: shifted spans still slice assistant " +
    "contents in the packed text") {
    val turns = Seq(
      (1L, 1, "user", "q one"), (1L, 2, "assistant", "ans one"),
      (2L, 1, "user", "q two"), (2L, 2, "assistant", "ans two"),
      (3L, 1, "user", "q 3"), (3L, 2, "assistant", "answer three"))
      .toDF("conv_id", "idx", "role", "content")
    val convs = Chat.chatTemplate(turns, "conv_id", "idx", "role",
      "content")
    // one shard, huge target -> everything lands in a single pack
    val pack = Chat.packConversations(convs, targetChars = 10000,
      shards = 1).collect().head
    val text = pack.getAs[String]("text")
    val spans = pack.getAs[String]("mask_spans").split(";")
    val sliced = spans.map { s =>
      val Array(a, b) = s.split(":").map(_.toInt)
      text.substring(a, b)
    }.toSeq
    assert(sliced === Seq("ans one", "ans two", "answer three"))
    assert(pack.getAs[Long]("n_convs") === 3L)
    assert(pack.getAs[Long]("packed_chars") === text.length.toLong)
  }

  test("packConversations: bin boundaries respect the running sum; " +
    "convs without assistant turns contribute no spans") {
    val turns = Seq(
      (1L, 1, "user", "x" * 50),
      (2L, 1, "assistant", "y" * 50),
      (3L, 1, "user", "z" * 50))
      .toDF("conv_id", "idx", "role", "content")
    val convs = Chat.chatTemplate(turns, "conv_id", "idx", "role",
      "content")
    // each rendered conv is 58/63/58 chars; target 60 puts conv 1 in
    // bin 0 (starts at 0), conv 2 in bin 0 (starts at 58), conv 3 in
    // bin 2 (starts at 121)
    val packs = Chat.packConversations(convs, targetChars = 60,
      shards = 1).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_convs"), r.getAs[String]("mask_spans"),
          r.getAs[String]("text"))).toMap
    assert(packs.keySet === Set(0L, 2L))
    assert(packs(0L)._1 === 2L && packs(2L)._1 === 1L)
    assert(packs(2L)._2 === "") // lone user conv: no loss span
    val Array(a, b) = packs(0L)._2.split(":").map(_.toInt)
    assert(packs(0L)._3.substring(a, b) === "y" * 50)
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

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

  test("tokenLossMask: char spans re-base to token spans; the " +
    "header-glued token straddles the boundary and is excluded") {
    val turns = Seq(
      (1L, 1, "user", "aa bb"), (1L, 2, "assistant", "bb cc dd"),
      (1L, 3, "assistant", "ee"))
      .toDF("conv_id", "idx", "role", "content")
    val vocab = Seq(("b", 10L), ("##b", 9L), ("cc", 8L), ("dd", 7L))
      .toDF("piece", "cnt")
    val convs = Chat.chatTemplate(turns, "conv_id", "idx", "role",
      "content")
    val r = Chat.tokenLossMask(convs, vocab).collect().head
    // words: <|user|>aa(UNK) bb(b ##b) <|assistant|>bb(UNK) cc dd
    //        <|assistant|>ee(UNK)
    assert(r.getAs[String]("pieces") ===
      "[UNK] b ##b [UNK] cc dd [UNK]")
    assert(r.getAs[Long]("n_tokens") === 7L)
    // only cc and dd sit FULLY inside an assistant span: the glued
    // <|assistant|>bb token starts before the span (header chars) and
    // must NOT carry loss, even though its word ends inside the span
    assert(r.getAs[Long]("n_masked_tokens") === 2L)
    assert(r.getAs[String]("token_mask_spans") === "4:6")
    // ids are vocab rank (cnt desc, piece asc, 1-based), [UNK] = 0
    assert(r.getAs[String]("token_ids") === "0,1,2,0,3,4,0")
  }

  test("tokenLossMask: an overlong word becomes one [UNK] token and " +
    "is masked when fully inside an assistant span") {
    val turns = Seq((2L, 1, "assistant", "cc " + "z" * 20))
      .toDF("conv_id", "idx", "role", "content")
    val vocab = Seq(("cc", 8L)).toDF("piece", "cnt")
    val convs = Chat.chatTemplate(turns, "conv_id", "idx", "role",
      "content")
    val r = Chat.tokenLossMask(convs, vocab).collect().head
    // <|assistant|>cc glues with the header (straddles -> unmasked);
    // the 20-char z-word exceeds maxWordLen, degrades to [UNK], and
    // lies fully inside the span -> masked
    assert(r.getAs[String]("pieces") === "[UNK] [UNK]")
    assert(r.getAs[Long]("n_tokens") === 2L)
    assert(r.getAs[Long]("n_masked_tokens") === 1L)
    assert(r.getAs[String]("token_mask_spans") === "1:2")
    assert(r.getAs[String]("token_ids") === "0,0")
  }

  test("tokenLossMask: content with double spaces, a tab and trailing " +
    "whitespace keeps token char extents aligned to the rendered text " +
    "(no phantom empty-word [UNK])") {
    // "cc  dd" (two spaces), "ee\tff", and a trailing space: prefix
    // sums over single-char separators must still land every token on
    // its true char extent, and the empty split elements from the
    // runs/trailing whitespace must never become [UNK] tokens
    val turns = Seq(
      (1L, 1, "user", "aa"), (1L, 2, "assistant", "cc  dd\tee "))
      .toDF("conv_id", "idx", "role", "content")
    val vocab = Seq(("cc", 9L), ("dd", 8L), ("ee", 7L))
      .toDF("piece", "cnt")
    val convs = Chat.chatTemplate(turns, "conv_id", "idx", "role",
      "content")
    val conv = convs.collect().head
    val text = conv.getAs[String]("text")
    val Array(s, e) = conv.getAs[String]("mask_spans").split(":")
      .map(_.toInt)
    assert(text.substring(s, e) === "cc  dd\tee ")
    val r = Chat.tokenLossMask(convs, vocab).collect().head
    // words: <|user|>aa(UNK) <|assistant|>cc(UNK, straddles) dd ee —
    // NO trailing [UNK] from the trailing space
    assert(r.getAs[String]("pieces") === "[UNK] [UNK] dd ee")
    assert(r.getAs[Long]("n_tokens") === 4L)
    // dd spans chars +4..+6 of the content (after "cc" + two spaces),
    // ee after the tab: both lie fully inside the assistant span
    assert(r.getAs[Long]("n_masked_tokens") === 2L)
    assert(r.getAs[String]("token_mask_spans") === "2:4")
  }

  test("packConversationsByTokens: a conversation with no token-count " +
    "row fails fast instead of silently dropping") {
    val convs = Seq((0L, "aa", 2L, ""), (1L, "bb", 2L, ""))
      .toDF("conv_id", "text", "total_chars", "mask_spans")
    val tokens = Seq((0L, 1L)).toDF("conv_id", "n_tokens")
    val ex = intercept[Exception] {
      Chat.packConversationsByTokens(convs, tokens, targetTokens = 3,
        shards = 1).collect()
    }
    assert(ex.getMessage.contains("no token count") ||
      Option(ex.getCause).exists(_.getMessage.contains("no token count")))
  }

  test("packConversationsByTokens: bins cut on token counts, spans " +
    "shift in chars, packs overflow only by their last conversation") {
    val convs = Seq(
      (0L, "aaaa bb", 7L, "5:7"),
      (1L, "cc", 2L, "0:2"),
      (2L, "dd ee ff gg", 11L, "0:2"))
      .toDF("conv_id", "text", "total_chars", "mask_spans")
    val tokens = Seq((0L, 2L), (1L, 1L), (2L, 6L))
      .toDF("conv_id", "n_tokens")
    val packs = Chat.packConversationsByTokens(convs, tokens,
      targetTokens = 3, shards = 1)
      .orderBy("bin").collect()
    assert(packs.length === 2)
    val p0 = packs(0)
    // conv 0 (2 tok) + conv 1 (1 tok) start inside token bin 0 even
    // though their char sizes are lopsided — the cut is tokens
    assert(p0.getAs[Long]("n_convs") === 2L)
    assert(p0.getAs[Long]("packed_tokens") === 3L)
    assert(p0.getAs[Long]("packed_chars") === 11L)
    assert(p0.getAs[String]("text") === "aaaa bb\n\ncc")
    // conv 1's span shifts by conv 0's chars + separator (7 + 2)
    assert(p0.getAs[String]("mask_spans") === "5:7;9:11")
    val p1 = packs(1)
    assert(p1.getAs[Long]("n_convs") === 1L)
    assert(p1.getAs[Long]("packed_tokens") === 6L)
    assert(p1.getAs[String]("mask_spans") === "0:2")
    // overflow invariant: a pack exceeds the target only by (part of)
    // its LAST conversation — tokens before the last stay under the
    // target (pack 0: 3 − 1 = 2 < 3; pack 1: 6 − 6 = 0 < 3)
    assert(p0.getAs[Long]("packed_tokens") - 1L < 3L)
    assert(p1.getAs[Long]("packed_tokens") - 6L < 3L)
  }

  test("packTokenMasks: per-pack token ids concatenate and token " +
    "spans re-base by cumulative token offsets, no separator tokens") {
    val convs = Seq(
      (0L, "a", 1L, ""), (1L, "b", 1L, ""), (2L, "c", 1L, ""))
      .toDF("conv_id", "text", "total_chars", "mask_spans")
    val tokens = Seq(
      (0L, 2L, "5,6", "1:2"),
      (1L, 1L, "7", "0:1"),
      (2L, 3L, "8,9,10", "0:2"))
      .toDF("conv_id", "n_tokens", "token_ids", "token_mask_spans")
    val packs = Chat.packTokenMasks(convs, tokens, targetTokens = 3,
      shards = 1).orderBy("bin").collect()
    assert(packs.length === 2)
    val p0 = packs(0)
    assert(p0.getAs[Long]("packed_tokens") === 3L)
    assert(p0.getAs[String]("token_ids") === "5,6,7")
    // conv 0's span stays; conv 1's shifts by conv 0's 2 tokens
    assert(p0.getAs[String]("token_mask_spans") === "1:2;2:3")
    val p1 = packs(1)
    assert(p1.getAs[String]("token_ids") === "8,9,10")
    assert(p1.getAs[String]("token_mask_spans") === "0:2")
  }

  test("validateTurns: each malformation is counted once and only " +
    "clean conversations come back valid") {
    val turns = Seq(
      // conv 1: clean
      (1L, 1, "user", "q"), (1L, 2, "assistant", "a"),
      // conv 2: duplicate idx (two 1s, hole at 2) + assistant-first
      // under the deterministic (idx, role, content) tie order
      (2L, 1, "user", "q"), (2L, 1, "assistant", "a"),
      // conv 3: same-role run + whitespace-only turn
      (3L, 1, "user", "q"), (3L, 2, "user", "  "),
      (3L, 3, "assistant", "a"),
      // conv 4: no assistant; idx starts at 2 (hole at 1, overshoot)
      (4L, 2, "user", "alone"),
      // conv 5: idx 0 (below 1)
      (5L, 0, "user", "q"), (5L, 2, "assistant", "a"))
      .toDF("conv_id", "idx", "role", "content")
    val out = Chat.validateTurns(turns, "conv_id", "idx", "role",
      "content").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6),
        r.getBoolean(7)))).toMap
    // (idx_gaps, bad_alternations, empty, starts_assistant, no_asst, valid)
    assert(out(1L) === ((0L, 0L, 0L, 0L, 0L, true)))
    // conv 2: dup idx -> 1 gap; 'assistant' sorts before 'user' at
    // idx 1 -> assistant-first AND an a,u order with no same-role run
    assert(out(2L) === ((1L, 0L, 0L, 1L, 0L, false)))
    assert(out(3L) === ((0L, 1L, 1L, 0L, 0L, false)))
    // conv 4: n=1, idx 2 -> overshoot 1; no assistant
    assert(out(4L) === ((1L, 0L, 0L, 0L, 1L, false)))
    // conv 5: n=2, idx {0,2}: below-1 count 1, max 2 = n -> 1 gap
    assert(out(5L) === ((1L, 0L, 0L, 0L, 0L, false)))
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

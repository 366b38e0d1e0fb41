package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Conversation (SFT/chat) training-data prep: role-tagged turn tables
  * → one rendered training text per conversation with LOSS-MASK SPANS
  * over the assistant turns — the exact artifact an instruction-tuning
  * pipeline feeds the trainer (tokens inside the spans contribute to
  * the loss; prompt/user tokens don't).
  *
  * Scale shape: one window keyed by conversation id (turn offsets are
  * per-conversation running sums — no global ordering anywhere) and one
  * hash aggregation to the conversation grain. Per-conversation state
  * is bounded by the caller's turn contract (conversations are
  * dozens-of-turns, never corpus-sized), so the collect_list is safe by
  * construction — the 100 TB axis is MANY conversations, which
  * partition freely.
  */
object Chat {

  /** Fail-fast coverage guard for the token-count join in
    * [[packConversationsByTokens]] / [[packTokenMasks]]: the tokens
    * frame must carry a row for every conversation — a silent inner
    * join here would shrink the corpus with no error (unlike
    * [[packConversations]], which keeps every conversation). The
    * left join + raise_error surfaces the missing conv_id instead.
    */
  private def requireCovered(nTokens: Column): Column =
    when(nTokens.isNull, raise_error(concat(
      lit("packConversationsByTokens/packTokenMasks: no token count " +
        "for conv_id="), col("conv_id").cast("string"),
      lit(" — the tokens frame must cover every conversation"))))
      .otherwise(nTokens)

  /** SFT-data lint — the validation pass an instruction-tuning
    * pipeline runs over raw turn tables BEFORE rendering
    * ([[chatTemplate]]) and masking ([[tokenLossMask]]): malformed
    * conversations (double-assistant runs from merge glitches, index
    * gaps from dropped rows, empty contents from extraction bugs,
    * prompts with no completion) silently poison the loss if they
    * reach the trainer. One row per conversation with the individual
    * violation counts AND the rolled-up `valid` flag, so the caller
    * can both gate (join on valid) and explain the yield (sum the
    * columns — the audit-frame discipline).
    *
    * Checks: `idx_gaps` — per-conversation turn indices are not
    * exactly 1..n, counted as duplicates (n − n_distinct) + indices
    * below 1 + max-index overshoot beyond n (0 iff the set is exactly
    * {1..n}). A NULL idx coalesces to Long.MinValue BEFORE windowing
    * and counting, so it orders first in EVERY engine (no NULLS
    * FIRST/LAST divergence can flip the adjacency or first-row
    * checks) and lands exactly once in the below-1 count (a second
    * NULL idx in the same conversation additionally counts as a
    * duplicate — both collapse to the sentinel); a NULL content lands
    * in `empty_turns` — malformed rows surface as violations, never
    * as errors. `bad_alternations`
    * — adjacent turns (by idx order) with the SAME role;
    * `empty_turns` — null or whitespace-only content;
    * `starts_with_assistant` — the first turn carries loss with no
    * prompt before it; `no_assistant` — nothing to train on.
    *
    * Scale shape: one window keyed by conversation + one hash
    * aggregate — the [[chatTemplate]] partitioning, corpus-parallel.
    * The adjacency window orders by (idx, role, content) so DUPLICATE
    * indices — the very malformation being detected — still order
    * deterministically and the lint replays identically in any
    * engine.
    *
    * @return one row per conversation: conv_id, n_turns, idx_gaps,
    *         bad_alternations, empty_turns,
    *         starts_with_assistant (0/1), no_assistant (0/1), valid
    */
  def validateTurns(
      turns: DataFrame, convCol: String, idxCol: String, roleCol: String,
      contentCol: String, assistantRole: String = "assistant"): DataFrame = {
    val w = Window.partitionBy(col("conv_id"))
      .orderBy(col("__idx"), col("__role"), col("__content"))
    // NULL idx → Long.MinValue sentinel: deterministic cross-engine
    // window order (Spark sorts nulls first, DuckDB last by default)
    // and a single below-1 violation, not an engine-dependent one
    val base = turns.select(col(convCol).as("conv_id"),
      coalesce(col(idxCol).cast("long"), lit(Long.MinValue)).as("__idx"),
      col(roleCol).as("__role"),
      col(contentCol).as("__content"))
      .withColumn("__prev_role", lag(col("__role"), 1).over(w))
      .withColumn("__rn", row_number().over(w))
    base.groupBy(col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("__prev_role").isNotNull
          && col("__prev_role") === col("__role"), 1L).otherwise(0L))
          .as("bad_alternations"),
        sum(when(col("__content").isNull
          || length(trim(col("__content"))) === 0, 1L).otherwise(0L))
          .as("empty_turns"),
        max(when(col("__rn") === 1
          && col("__role") === assistantRole, 1L).otherwise(0L))
          .as("starts_with_assistant"),
        when(sum(when(col("__role") === assistantRole, 1L).otherwise(0L))
          === 0, 1L).otherwise(0L).as("no_assistant"),
        countDistinct(col("__idx")).as("__nd"),
        sum(when(col("__idx") >= 1, 1L).otherwise(0L)).as("__ge1"),
        max(col("__idx")).as("__mx"))
      .withColumn("idx_gaps",
        // indices are exactly {1..n} iff all distinct, min >= 1 and
        // max = n; violations counted as (n - n_distinct) duplicates
        // plus how far max/min stray from the 1..n frame
        (col("n_turns") - col("__nd"))
          + (col("n_turns") - col("__ge1"))
          + when(col("__mx") > col("n_turns"),
              col("__mx") - col("n_turns")).otherwise(0L))
      .withColumn("valid",
        col("idx_gaps") === 0 && col("bad_alternations") === 0
          && col("empty_turns") === 0
          && col("starts_with_assistant") === 0
          && col("no_assistant") === 0)
      .select(col("conv_id"), col("n_turns"), col("idx_gaps"),
        col("bad_alternations"), col("empty_turns"),
        col("starts_with_assistant"), col("no_assistant"), col("valid"))
  }

  /** Render `<|role|>content` turns joined by newlines, with
    * 0-based [start, end) character offsets of each assistant turn's
    * CONTENT in the rendered text.
    *
    * @param turns one row per turn: conversation id, a 1-based
    *              per-conversation turn index (unique within the
    *              conversation), role, content — all non-null
    * @param assistantRole the role whose content spans carry loss
    * @return one row per conversation: conv_id, n_turns, n_user_turns
    *         (turns of any non-assistant role), n_assistant_turns,
    *         text, total_chars, assistant_chars, mask_spans
    *         ("start:end" joined by ";", turn order; "" when the
    *         conversation has no assistant turn)
    */
  def chatTemplate(
      turns: DataFrame, convCol: String, idxCol: String, roleCol: String,
      contentCol: String, assistantRole: String = "assistant"): DataFrame = {
    val seg = concat(lit("<|"), col(roleCol), lit("|>"), col(contentCol))
    val w = Window.partitionBy(col("conv_id")).orderBy(col("__idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withOff = turns
      .select(col(convCol).as("conv_id"), col(idxCol).as("__idx"),
        col(roleCol).as("__role"), seg.as("__seg"),
        length(col(contentCol)).as("__clen"),
        (length(col(roleCol)) + lit(4)).as("__hlen"))
      .withColumn("__off",
        coalesce(sum(length(col("__seg")) + lit(1)).over(w), lit(0L)))
      .withColumn("__start", col("__off") + col("__hlen"))
      .withColumn("__end",
        col("__off") + col("__hlen") + col("__clen"))
    withOff
      .groupBy(col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("__role") =!= assistantRole, 1L).otherwise(0L))
          .as("n_user_turns"),
        sum(when(col("__role") === assistantRole, 1L).otherwise(0L))
          .as("n_assistant_turns"),
        sum(when(col("__role") === assistantRole, col("__clen").cast("long"))
          .otherwise(0L)).as("assistant_chars"),
        sort_array(collect_list(struct(
          col("__idx"), col("__role"), col("__seg"),
          col("__start"), col("__end")))).as("__ts"))
      .select(col("conv_id"), col("n_turns"), col("n_user_turns"),
        col("n_assistant_turns"),
        array_join(transform(col("__ts"), t => t("__seg")), "\n")
          .as("text"),
        col("assistant_chars"),
        array_join(transform(
          filter(col("__ts"), t => t("__role") === assistantRole),
          t => concat(t("__start"), lit(":"), t("__end"))), ";")
          .as("mask_spans"))
      .withColumn("total_chars", length(col("text")).cast("long"))
      .select(col("conv_id"), col("n_turns"), col("n_user_turns"),
        col("n_assistant_turns"), col("text"), col("total_chars"),
        col("assistant_chars"), col("mask_spans"))
  }

  /** Token-level loss masks: re-express [[chatTemplate]]'s CHAR-offset
    * mask spans as TOKEN-index spans under a LOADED WordPiece
    * vocabulary — the artifact an SFT trainer actually consumes (it
    * masks token positions, not characters). This is the composition
    * round 10 left open: render (q423) → tokenize with a persisted
    * vocab ([[TokenizerStore.loadWordpieceVocab]] →
    * [[TextAnalysis.wordpieceSegmentWith]]) → map every char span to
    * the tokens it fully contains.
    *
    * Tokenization contract: the rendered text is split on INDIVIDUAL
    * whitespace characters (`[ \t\n\f\r]` — each separator is
    * exactly one char by construction, so word char offsets are exact
    * prefix sums of `length(word) + 1` for ANY content whitespace:
    * runs, tabs, CRLF and trailing whitespace contribute empty
    * elements that advance the offset by their one separator char and
    * are then dropped, never tokenized); each word ≤ `maxWordLen` segments
    * greedily against `vocab`, and an unsegmentable or overlong word
    * becomes one `[UNK]` token covering the whole word (the BERT
    * `max_input_chars_per_word` rule). A token carries loss iff its
    * char extent lies FULLY inside a mask span — so the token that
    * glues a turn header to the first content word is correctly
    * EXCLUDED (it straddles the span boundary), the alignment subtlety
    * char-granularity masking lets a trainer get wrong.
    *
    * Token ids are the vocabulary rank (count desc, piece asc,
    * 1-based; `[UNK]` = 0) — the order a vocab file would be written
    * in. Scale shape: every window partitions by conversation (or
    * conversation × word), conversations are bounded by construction,
    * and the vocabulary join broadcasts; the one unpartitioned window
    * ranks the VOCABULARY, which is artifact-sized (hundreds of rows)
    * by construction.
    *
    * @param convs [[chatTemplate]] output (conv_id, text, mask_spans)
    * @param vocab (piece, cnt) WordPiece vocabulary in surface form
    * @return one row per conversation: conv_id, n_tokens,
    *         n_masked_tokens, token_ids (","-joined in token order),
    *         pieces (" "-joined), token_mask_spans ("s:e" token-index
    *         spans, end-exclusive, ";"-joined; "" when nothing is
    *         masked)
    */
  def tokenLossMask(
      convs: DataFrame, vocab: DataFrame,
      maxPieceLen: Int = 4, maxWordLen: Int = 16): DataFrame = {
    // split on SINGLE whitespace chars (not "\\s+"): every element
    // boundary is exactly one separator char, so the prefix sum below
    // is positionally exact even when content carries runs/tabs/CRLF —
    // a "\\s+" split would silently shift every later word's offset by
    // the extra separator chars (and a trailing run would add a
    // phantom empty word). Empty elements advance the offset by their
    // 1 separator char and are dropped AFTER the sum.
    val words = convs
      .select(col("conv_id"), col("mask_spans"),
        posexplode(split(col("text"), "[ \t\n\\x0B\f\r]")))
      .withColumnRenamed("pos", "__wpos").withColumnRenamed("col", "__word")
    val wOff = Window.partitionBy(col("conv_id")).orderBy(col("__wpos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withOff = words.withColumn("__ws",
      coalesce(sum((length(col("__word")) + lit(1)).cast("long")).over(wOff),
        lit(0L)))
      .filter(length(col("__word")) >= 1)
    // segment the DISTINCT word set once; overlong words (dropped by
    // the segmenter's word filter) come back null and take the [UNK]
    // branch below
    val seg = TextAnalysis.wordpieceSegmentWith(
      words.select(col("__word").as("__w")).distinct(), "__w", vocab,
      maxPieceLen, maxWordLen)
      .select(col("word").as("__segword"), col("pieces").as("__segpieces"))
    val joined = withOff
      .join(broadcast(seg), lower(col("__word")) === col("__segword"),
        "left")
      .withColumn("__pieces",
        when(col("__segpieces").isNull, array(lit("[UNK]")))
          .otherwise(split(col("__segpieces"), " ")))
    val toks = joined
      .select(col("conv_id"), col("mask_spans"), col("__wpos"),
        col("__ws"), length(col("__word")).cast("long").as("__wlen"),
        posexplode(col("__pieces")))
      .withColumnRenamed("pos", "__ppos").withColumnRenamed("col", "__piece")
      .withColumn("__plen",
        when(col("__piece") === "[UNK]", col("__wlen"))
          .otherwise((length(col("__piece"))
            - when(col("__piece").startsWith("##"), lit(2))
              .otherwise(lit(0))).cast("long")))
    val pOff = Window.partitionBy(col("conv_id"), col("__wpos"))
      .orderBy(col("__ppos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tOrd = Window.partitionBy(col("conv_id"))
      .orderBy(col("__wpos"), col("__ppos"))
    val spanOf: Column => Column = s => struct(
      split(s, ":")(0).cast("long").as("s"),
      split(s, ":")(1).cast("long").as("e"))
    val placed = toks
      .withColumn("__ps",
        col("__ws") + coalesce(sum(col("__plen")).over(pOff), lit(0L)))
      .withColumn("__pe", col("__ps") + col("__plen"))
      .withColumn("__tidx", (row_number().over(tOrd) - 1).cast("long"))
      .withColumn("__masked", exists(
        filter(split(col("mask_spans"), ";"), s => s =!= ""),
        s => col("__ps") >= spanOf(s)("s") && col("__pe") <= spanOf(s)("e")))
    // vocabulary rank = token id; the unpartitioned window is over the
    // ARTIFACT (vocab rows, hundreds by construction), never the corpus
    val vocabIds = vocab.select(col("piece").as("__piece"),
      row_number().over(Window.orderBy(col("cnt").desc, col("piece")))
        .cast("long").as("__vid"))
    val withIds = placed
      .join(broadcast(vocabIds), Seq("__piece"), "left")
      .withColumn("__tid", coalesce(col("__vid"), lit(0L)))
    val wRun = Window.partitionBy(col("conv_id")).orderBy(col("__tidx"))
    val runs = withIds.filter(col("__masked"))
      .withColumn("__grp", col("__tidx") - row_number().over(wRun))
      .groupBy(col("conv_id"), col("__grp"))
      .agg(min(col("__tidx")).as("__s"), (max(col("__tidx")) + 1L).as("__e"))
      .groupBy(col("conv_id"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("__s"), col("__e")))),
        r => concat(r("__s"), lit(":"), r("__e"))), ";")
        .as("__runs"))
    withIds
      .groupBy(col("conv_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("__masked").cast("long")).as("n_masked_tokens"),
        array_join(transform(
          sort_array(collect_list(struct(col("__tidx"), col("__tid")))),
          t => t("__tid")), ",").as("token_ids"),
        array_join(transform(
          sort_array(collect_list(struct(col("__tidx"),
            col("__piece").as("__p")))),
          t => t("__p")), " ").as("pieces"))
      .join(runs, Seq("conv_id"), "left")
      .select(col("conv_id"), col("n_tokens"), col("n_masked_tokens"),
        col("token_ids"), col("pieces"),
        coalesce(col("__runs"), lit("")).as("token_mask_spans"))
  }

  /** Pack rendered conversations ([[chatTemplate]] rows) into
    * fixed-size training sequences WITH the loss-mask spans re-based
    * into the packed text — the step naive packing gets wrong: spans
    * are per-conversation offsets, and concatenation shifts every one.
    *
    * Same sharded concatenate-and-cut discipline as
    * `TextAnalysis.packSequences`: conversations shard by
    * `pmod(conv_id, shards)` (no global running sum — shards scale
    * horizontally), a per-shard running sum assigns each conversation
    * to the bin where it starts, and conversations within a bin join
    * with a blank line ("\n\n", 2 chars) in conv_id order. Each
    * conversation's spans shift by its offset in the pack.
    *
    * @param convs [[chatTemplate]] output (conv_id, text, total_chars,
    *              mask_spans)
    * @return one row per pack: shard, bin, n_convs, packed_chars
    *         (separators included), text, mask_spans (shifted,
    *         ";"-joined in conv order; "" when no conversation in the
    *         pack has an assistant turn)
    */
  /** [[packConversations]] with the bin cut driven by TOKEN counts —
    * what a training pipeline actually packs by (a sequence budget is
    * tokens, not characters; char-cut packs mis-size by the corpus'
    * chars-per-token ratio and its variance). Token counts come from
    * the caller — e.g. [[tokenLossMask]]'s `n_tokens` under a
    * persisted vocabulary — joined on `conv_id`, so the tokenizer is
    * trained once and the pack sees real counts.
    *
    * Same sharded concatenate-and-cut discipline: per-shard running
    * TOKEN sum assigns each conversation to the bin where it starts
    * (so a pack may overflow `targetTokens` by less than its LAST
    * conversation — the invariant the spec pins), while the mask-span
    * re-basing stays in CHAR offsets (concatenation shifts
    * characters, whatever the bin metric).
    *
    * @param convs  [[chatTemplate]] output (conv_id, text,
    *               total_chars, mask_spans)
    * @param tokens (conv_id, n_tokens) — e.g. [[tokenLossMask]] output;
    *               MUST cover every conv_id in `convs` (a conversation
    *               with no token-count row fails the query at runtime
    *               rather than silently vanishing from the corpus)
    * @return one row per pack: shard, bin, n_convs, packed_tokens,
    *         packed_chars, text, mask_spans (char-shifted)
    */
  def packConversationsByTokens(
      convs: DataFrame, tokens: DataFrame, targetTokens: Int,
      shards: Int = 64): DataFrame = {
    require(targetTokens > 0 && shards > 0,
      "need positive target and shards")
    val wRun = Window.partitionBy(col("__shard")).orderBy(col("conv_id"))
    val wOff = Window.partitionBy(col("__shard"), col("bin"))
      .orderBy(col("conv_id")).rowsBetween(Window.unboundedPreceding, -1)
    val binned = convs
      .join(tokens.select(col("conv_id"), col("n_tokens")), Seq("conv_id"),
        "left")
      .withColumn("n_tokens", requireCovered(col("n_tokens")))
      .withColumn("__shard", pmod(col("conv_id"), lit(shards)))
      .withColumn("__end", sum(col("n_tokens")).over(wRun))
      .withColumn("bin",
        floor((col("__end") - col("n_tokens")) / lit(targetTokens)))
      .withColumn("__off",
        coalesce(sum(col("total_chars") + lit(2L)).over(wOff), lit(0L)))
    val shifted = binned.withColumn("__sspans",
      array_join(transform(
        filter(split(col("mask_spans"), ";"), s => s =!= ""),
        s => concat(
          split(s, ":")(0).cast("long") + col("__off"), lit(":"),
          split(s, ":")(1).cast("long") + col("__off"))), ";"))
    shifted
      .groupBy(col("__shard").cast("long").as("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_convs"),
        sum(col("n_tokens")).as("packed_tokens"),
        (sum(col("total_chars")) + (count(lit(1)) - 1L) * lit(2L))
          .as("packed_chars"),
        sort_array(collect_list(struct(
          col("conv_id"), col("text"), col("__sspans")))).as("__cs"))
      .select(col("shard"), col("bin"), col("n_convs"),
        col("packed_tokens"), col("packed_chars"),
        array_join(transform(col("__cs"), c => c("text")), "\n\n")
          .as("text"),
        array_join(filter(transform(col("__cs"), c => c("__sspans")),
          s => s =!= ""), ";").as("mask_spans"))
  }

  /** The final trainer artifact: token-budget packs whose per-pack
    * token id sequence and TOKEN-index mask spans are both assembled —
    * [[packConversationsByTokens]] told where each conversation goes,
    * this re-bases [[tokenLossMask]]'s token spans by each
    * conversation's cumulative token offset in its pack. Offsets are
    * exact with NO separator correction: the pack separator is pure
    * whitespace ("\n\n"), words split on whitespace runs, so the
    * pack's token sequence is exactly the concatenation of the
    * member conversations' sequences.
    *
    * @param convs  [[chatTemplate]] output
    * @param tokens [[tokenLossMask]] output (conv_id, n_tokens,
    *               token_ids, token_mask_spans); MUST cover every
    *               conv_id in `convs` (fail-fast, as in
    *               [[packConversationsByTokens]])
    * @return one row per pack: shard, bin, n_convs, packed_tokens,
    *         token_ids (","-joined across the pack),
    *         token_mask_spans (token-index spans, re-based, ";"-joined)
    */
  def packTokenMasks(
      convs: DataFrame, tokens: DataFrame, targetTokens: Int,
      shards: Int = 64): DataFrame = {
    require(targetTokens > 0 && shards > 0,
      "need positive target and shards")
    val wRun = Window.partitionBy(col("__shard")).orderBy(col("conv_id"))
    val wOff = Window.partitionBy(col("__shard"), col("bin"))
      .orderBy(col("conv_id")).rowsBetween(Window.unboundedPreceding, -1)
    val binned = convs.select(col("conv_id"))
      .join(tokens.select(col("conv_id"), col("n_tokens"),
        col("token_ids"), col("token_mask_spans")), Seq("conv_id"), "left")
      .withColumn("n_tokens", requireCovered(col("n_tokens")))
      .withColumn("__shard", pmod(col("conv_id"), lit(shards)))
      .withColumn("__end", sum(col("n_tokens")).over(wRun))
      .withColumn("bin",
        floor((col("__end") - col("n_tokens")) / lit(targetTokens)))
      .withColumn("__toff",
        coalesce(sum(col("n_tokens")).over(wOff), lit(0L)))
    val shifted = binned.withColumn("__sspans",
      array_join(transform(
        filter(split(col("token_mask_spans"), ";"), s => s =!= ""),
        s => concat(
          split(s, ":")(0).cast("long") + col("__toff"), lit(":"),
          split(s, ":")(1).cast("long") + col("__toff"))), ";"))
    shifted
      .groupBy(col("__shard").cast("long").as("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_convs"),
        sum(col("n_tokens")).as("packed_tokens"),
        sort_array(collect_list(struct(
          col("conv_id"), col("token_ids").as("__ids"),
          col("__sspans")))).as("__cs"))
      .select(col("shard"), col("bin"), col("n_convs"),
        col("packed_tokens"),
        array_join(transform(col("__cs"), c => c("__ids")), ",")
          .as("token_ids"),
        array_join(filter(transform(col("__cs"), c => c("__sspans")),
          s => s =!= ""), ";").as("token_mask_spans"))
  }

  def packConversations(
      convs: DataFrame, targetChars: Int, shards: Int = 64): DataFrame = {
    require(targetChars > 0 && shards > 0, "need positive target and shards")
    val wRun = Window.partitionBy(col("__shard")).orderBy(col("conv_id"))
    val wOff = Window.partitionBy(col("__shard"), col("bin"))
      .orderBy(col("conv_id")).rowsBetween(Window.unboundedPreceding, -1)
    val binned = convs
      .withColumn("__shard", pmod(col("conv_id"), lit(shards)))
      .withColumn("__end", sum(col("total_chars")).over(wRun))
      .withColumn("bin",
        floor((col("__end") - col("total_chars")) / lit(targetChars)))
      .withColumn("__off",
        coalesce(sum(col("total_chars") + lit(2L)).over(wOff), lit(0L)))
    val shifted = binned.withColumn("__sspans",
      array_join(transform(
        filter(split(col("mask_spans"), ";"), s => s =!= ""),
        s => concat(
          split(s, ":")(0).cast("long") + col("__off"), lit(":"),
          split(s, ":")(1).cast("long") + col("__off"))), ";"))
    shifted
      .groupBy(col("__shard").cast("long").as("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_convs"),
        (sum(col("total_chars")) + (count(lit(1)) - 1L) * lit(2L))
          .as("packed_chars"),
        sort_array(collect_list(struct(
          col("conv_id"), col("text"), col("__sspans")))).as("__cs"))
      .select(col("shard"), col("bin"), col("n_convs"),
        col("packed_chars"),
        array_join(transform(col("__cs"), c => c("text")), "\n\n")
          .as("text"),
        array_join(filter(transform(col("__cs"), c => c("__sspans")),
          s => s =!= ""), ";").as("mask_spans"))
  }
}

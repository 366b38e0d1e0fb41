package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

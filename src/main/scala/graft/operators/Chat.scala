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
}

package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Materialize
import graft.operators.Chat

/** The instruction-tuning capstone — the SFT twin of [[WarcPipeline]]:
  * raw role-tagged TURN tables in, token-budget training packs with
  * re-based TOKEN-index loss masks out, composed end to end:
  *
  *   SFT-data lint ([[Chat.validateTurns]], gate on `valid`) →
  *   chat-template rendering with char mask spans
  *   ([[Chat.chatTemplate]]) → token-level loss masks under a
  *   PERSISTED WordPiece vocabulary ([[Chat.tokenLossMask]]) →
  *   token-budget packs with token-offset-re-based spans
  *   ([[Chat.packTokenMasks]])
  *
  * Every stage is its own oracle-verified operator (q451 lint, q423
  * template, q436 masks, q439 packs); this object owns only the
  * composition and the per-stage yield audit — the seams (mask
  * re-basing across packs, lint-gate id domains, the token-count
  * coverage join) are exactly where chaining bugs hide, which is why
  * the pack stage inherits [[Chat.packTokenMasks]]'s fail-fast on any
  * conversation the mask stage failed to cover.
  *
  * Scale shape: the lint and render stages are one
  * conversation-keyed window + one hash aggregate each; the gate is a
  * conversation-grain left-semi join (corpus-parallel, no broadcast
  * needed — both sides shuffle on conv_id); the tokenizer arrives
  * LOADED (train-once/score-everywhere parquet — a 100 TB SFT sweep
  * pays only its own segmentation, against a broadcast vocab); packing
  * shards by `pmod(conv_id, shards)` so no global running sum exists
  * anywhere. Stage boundaries go through [[Materialize.cut]] so the
  * mask and pack fan-outs read materialized conversation blocks
  * instead of re-running the lint window.
  */
object SftPipeline {

  final case class SftPipelineConfig(
      assistantRole: String = "assistant",
      targetTokens: Int = 120,
      shards: Int = 8,
      maxPieceLen: Int = 4,
      maxWordLen: Int = 16)

  /** @param packs the trainer artifact: one row per pack (shard, bin,
    *              n_convs, packed_tokens, token_ids, token_mask_spans)
    * @param masks the per-conversation token masks (kept for shard
    *              manifests / eval splits)
    * @param audit (stage, rows) in pipeline order: turns →
    *              valid_convs → rendered → masked → packs
    */
  final case class SftPipelineResult(
      packs: DataFrame,
      masks: DataFrame,
      audit: Seq[(String, Long)])

  /** @param turns one row per turn (convCol, idxCol, roleCol,
    *              contentCol) — malformed conversations are expected
    *              and dropped by the lint gate, never errored
    * @param vocab LOADED persisted WordPiece vocabulary
    *              ([[graft.operators.TokenizerStore.loadWordpieceVocab]])
    * @param withAudit when false, skip the per-stage counts (each is
    *                  an action) — the pack-only production path
    */
  def run(
      turns: DataFrame,
      vocab: DataFrame,
      convCol: String,
      idxCol: String,
      roleCol: String,
      contentCol: String,
      cfg: SftPipelineConfig = SftPipelineConfig(),
      withAudit: Boolean = true): SftPipelineResult = {
    val audit = Seq.newBuilder[(String, Long)]
    if (withAudit) audit += ("turns" -> turns.count())

    // lint gate: only conversations that pass EVERY check render —
    // a malformed conversation reaching the trainer poisons the loss
    val lint = Chat.validateTurns(
      turns, convCol, idxCol, roleCol, contentCol, cfg.assistantRole)
    val gated = Materialize.cut(
      turns.select(col(convCol).as("conv_id"),
        col(idxCol).as("__idx"), col(roleCol).as("__role"),
        col(contentCol).as("__content"))
        .join(lint.filter(col("valid")).select(col("conv_id")),
          Seq("conv_id"), "left_semi"))
    if (withAudit)
      audit += ("valid_convs" -> gated.select(col("conv_id"))
        .distinct().count())

    val convs = Materialize.cut(
      Chat.chatTemplate(gated, "conv_id", "__idx", "__role",
        "__content", cfg.assistantRole))
    if (withAudit) audit += ("rendered" -> convs.count())

    // masks under the LOADED vocab; must cover every rendered
    // conversation — packTokenMasks raises on any gap (the seam where
    // silent inner-join shrinkage bugs live)
    val masks = Materialize.cut(
      Chat.tokenLossMask(convs, vocab, cfg.maxPieceLen, cfg.maxWordLen))
    if (withAudit) audit += ("masked" -> masks.count())

    val packs = Materialize.cut(
      Chat.packTokenMasks(convs, masks, cfg.targetTokens, cfg.shards))
    if (withAudit) audit += ("packs" -> packs.count())

    SftPipelineResult(packs, masks, audit.result())
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the
  * canonical-composition pass every multilingual corpus pipeline runs
  * before hashing or dedup: "é" as U+00E9 and as U+0065 U+0301 are the
  * same text to a reader but different bytes to every fingerprint,
  * shingle, and exact-dedup key in this engine, so un-normalized input
  * silently splits duplicate groups. Spark ships no normalizer
  * built-in; a Scala UDF would box every row and fall out of
  * whole-stage codegen, so this is a codegen'd `UnaryExpression` over
  * the JDK's `java.text.Normalizer` (Unicode-standard NFC, the same
  * algorithm DuckDB's `nfc_normalize` implements — which is what makes
  * the result oracle-checkable).
  *
  * Already-normalized text (the overwhelming majority at corpus scale)
  * takes the `Normalizer.isNormalized` fast path: one scan, no
  * allocation, no copy of the UTF8String.
  *
  * Registered as SQL function `graft_nfc_normalize` by
  * [[GraftExtensions]].
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalizeExpr.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc_normalize"
}

object NfcNormalizeExpr {
  /** Called from generated code — must stay public. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column form via the session registry (the engine's established
    * route from a Catalyst expression to the Column API — same pattern
    * as the quantized-dot and bloom expressions). Registration is
    * idempotent and the expression is stateless, so re-registering
    * under the fixed name cannot race.
    */
  def nfcNormalize(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc_normalize", exprs => NfcNormalizeExpr(exprs.head), "scala_udf")
    org.apache.spark.sql.functions.call_function("graft_nfc_normalize", c)
  }
}

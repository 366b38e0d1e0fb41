package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for accent stripping — NFD decomposition
  * followed by removal of Unicode mark codepoints (categories Mn/Mc/Me),
  * the multilingual-search normalization that folds "café" → "cafe" and
  * "naïve" → "naive" so accent variants hash, shingle, and join as one
  * key. Characters with no canonical decomposition ("ø", ligature "ﬁ")
  * pass through untouched, and there is NO recomposition — this is
  * exactly the contract of DuckDB's `strip_accents` (utf8proc
  * decompose + strip-mark), which is what makes the result
  * oracle-checkable across engines.
  *
  * Same design as [[NfcNormalizeExpr]]: codegen'd `UnaryExpression`
  * (a Scala UDF would box rows and break whole-stage codegen), with an
  * ASCII fast path — one scan, no allocation — since marks cannot occur
  * in pure-ASCII text, which is most bytes at corpus scale.
  *
  * Registered as SQL function `graft_strip_accents` by
  * [[GraftExtensions]].
  */
case class StripAccentsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    StripAccentsExpr.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.StripAccentsExpr.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_strip_accents"
}

object StripAccentsExpr {
  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")

  /** Called from generated code — must stay public. */
  def strip(s: UTF8String): UTF8String = {
    val str = s.toString
    var i = 0
    var ascii = true
    while (ascii && i < str.length) {
      if (str.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) return s
    val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    UTF8String.fromString(Marks.matcher(nfd).replaceAll(""))
  }

  /** Column form via the session registry — same route as
    * [[NfcNormalizeExpr.nfcNormalize]].
    */
  def stripAccents(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_strip_accents", exprs => StripAccentsExpr(exprs.head), "scala_udf")
    org.apache.spark.sql.functions.call_function("graft_strip_accents", c)
  }
}

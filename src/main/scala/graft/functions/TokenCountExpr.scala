package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for whitespace token counting — the
  * single hottest statistic in corpus curation (every quality filter,
  * token budget, and mixture weight consumes it), so it deserves a
  * single-pass implementation: one scan over the UTF-8 BYTES counting
  * non-space→space transitions, zero allocation.
  *
  * `size(split(trim(s), "\\s+"))` — the composable form used by
  * [[TextFunctions.tokens]] consumers — materializes the full token
  * ARRAY (a per-row allocation proportional to document size) just to
  * read its length. At 100 TB that array churn is pure GC pressure.
  * This expression is semantically identical on trimmed input
  * (contract pinned against the split form in the spec and against
  * the regexp oracle in the harness) and allocation-free.
  *
  * Whitespace = the regex `\s` set (space, \t, \n, \x0B, \f, \r).
  * All are single ASCII bytes, so the scan can run on raw bytes
  * without decoding — multibyte UTF-8 continuation bytes are >= 0x80
  * and never collide. Empty / all-whitespace input counts 0 (what
  * "how many tokens" means; note `split` on empty input yields [""]
  * and would say 1 — this is the deliberate delta, documented here).
  *
  * Registered as SQL function `graft_token_count` by
  * [[GraftExtensions]].
  */
case class TokenCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    TokenCountExpr.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenCountExpr.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_token_count"
}

object TokenCountExpr {

  /** Called from generated code — must stay public. One pass over the
    * raw UTF-8 bytes; a token begins at every non-ws byte whose
    * predecessor is ws (or start-of-string).
    */
  def count(s: UTF8String): Long = {
    val n = s.numBytes()
    var i = 0
    var tokens = 0L
    var inWs = true
    while (i < n) {
      val b = s.getByte(i)
      // \s = space, \t (9), \n (10), \x0B (11), \f (12), \r (13);
      // multibyte UTF-8 bytes are negative as Java bytes, never ws
      val ws = b == 0x20 || (b >= 0x09 && b <= 0x0d)
      if (!ws && inWs) tokens += 1L
      inWs = ws
      i += 1
    }
    tokens
  }

  /** Column form via the session registry. */
  def tokenCount(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_token_count", exprs => TokenCountExpr(exprs.head), "scala_udf")
    org.apache.spark.sql.functions.call_function("graft_token_count", c)
  }
}

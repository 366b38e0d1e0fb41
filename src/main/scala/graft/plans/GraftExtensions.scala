package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{IpToIntExpr, LuhnCardCountExpr, LuhnMaskExpr, MortonExpr, NfcNormalizeExpr, QuantizedDotExpr, StripAccentsExpr}

/** Engine extensions, installed with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Registers the native codegen expressions as SQL functions so pure-SQL
  * users get them too (`SELECT graft_ip_to_int(ip) FROM ...`). No custom
  * planner rules are injected: every graft operator lowers to Catalyst
  * built-ins by construction (SURVEY.md §4 — "no custom Rule/
  * SparkStrategy needed for parity"), which keeps AQE, codegen and
  * pushdown fully applicable.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  // arity must be checked in the builder: the registry applies it
  // blindly, so a pure-SQL user calling graft_ip_to_int(ip, fmt) would
  // otherwise have the extra argument silently DISCARDED (plausible
  // wrong usage runs clean), and a missing argument would surface as a
  // raw NoSuchElementException instead of an analysis-time error
  private def arity(
      name: String, n: Int,
      children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Unit =
    if (children.size != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name,
          "expectedNum" -> n.toString,
          "actualNum" -> children.size.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_ip_to_int"),
      new ExpressionInfo(classOf[IpToIntExpr].getName, "graft_ip_to_int"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_ip_to_int", 1, children)
        IpToIntExpr(org.apache.spark.sql.catalyst.expressions.Cast(
          children.head, org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName,
        "graft_nfc_normalize"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_nfc_normalize", 1, children)
        NfcNormalizeExpr(org.apache.spark.sql.catalyst.expressions.Cast(
          children.head, org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_strip_accents"),
      new ExpressionInfo(classOf[StripAccentsExpr].getName,
        "graft_strip_accents"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_strip_accents", 1, children)
        StripAccentsExpr(org.apache.spark.sql.catalyst.expressions.Cast(
          children.head, org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_token_count"),
      new ExpressionInfo(classOf[graft.functions.TokenCountExpr].getName,
        "graft_token_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_token_count", 1, children)
        graft.functions.TokenCountExpr(
          org.apache.spark.sql.catalyst.expressions.Cast(
            children.head, org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDotExpr].getName,
        "graft_quantized_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_quantized_dot", 2, children)
        QuantizedDotExpr(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_luhn_mask"),
      new ExpressionInfo(classOf[LuhnMaskExpr].getName, "graft_luhn_mask"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_luhn_mask", 1, children)
        LuhnMaskExpr(org.apache.spark.sql.catalyst.expressions.Cast(
          children.head, org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_luhn_count"),
      new ExpressionInfo(classOf[LuhnCardCountExpr].getName,
        "graft_luhn_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_luhn_count", 1, children)
        LuhnCardCountExpr(org.apache.spark.sql.catalyst.expressions.Cast(
          children.head, org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[graft.functions.JaroWinklerExpr].getName,
        "graft_jaro_winkler"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_jaro_winkler", 2, children)
        graft.functions.JaroWinklerExpr(
          org.apache.spark.sql.catalyst.expressions.Cast(
            children(0), org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.catalyst.expressions.Cast(
            children(1), org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_morton"),
      new ExpressionInfo(classOf[MortonExpr].getName, "graft_morton"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_morton", 2, children)
        MortonExpr(
          org.apache.spark.sql.catalyst.expressions.Cast(
            children(0), org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.catalyst.expressions.Cast(
            children(1), org.apache.spark.sql.types.LongType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_exact_dot"),
      new ExpressionInfo(classOf[graft.functions.ExactDotExpr].getName,
        "graft_exact_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_exact_dot", 2, children)
        graft.functions.ExactDotExpr(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_plain_dot"),
      new ExpressionInfo(classOf[graft.functions.PlainDotExpr].getName,
        "graft_plain_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_plain_dot", 2, children)
        graft.functions.PlainDotExpr(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_exact_dot_positive"),
      new ExpressionInfo(classOf[graft.functions.ExactDotPositiveExpr].getName,
        "graft_exact_dot_positive"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_exact_dot_positive", 2, children)
        graft.functions.ExactDotPositiveExpr(children(0), children(1))
      }))
  }
}

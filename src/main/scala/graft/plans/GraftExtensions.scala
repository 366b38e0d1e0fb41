package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{IpToIntExpr, QuantizedDotExpr}

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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_ip_to_int"),
      new ExpressionInfo(classOf[IpToIntExpr].getName, "graft_ip_to_int"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        IpToIntExpr(org.apache.spark.sql.catalyst.expressions.Cast(
          children.head, org.apache.spark.sql.types.StringType))))
    ext.injectFunction((
      new FunctionIdentifier("graft_quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDotExpr].getName,
        "graft_quantized_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        QuantizedDotExpr(children(0), children(1))))
  }
}

package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's native Catalyst expressions and the public
  * Column API (Spark 4 removed the public `Column(expr)` constructor in
  * favor of ColumnNode). Building the expression tree DIRECTLY — rather
  * than registering temp functions and resolving them by name at
  * analysis time — matters for correctness, not just hygiene: a
  * streaming micro-batch analyzes plans under a CLONED session whose
  * function registry does not reliably see functions registered on the
  * outer session after the stream started (observed: UNRESOLVED_ROUTINE
  * for `graft_exact_dot` inside `foreachBatch` while every batch query
  * resolved fine). An in-tree expression has no name to resolve, so it
  * works identically under any session.
  */
object ColumnShim {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}

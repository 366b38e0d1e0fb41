package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnShim

/** Column-level entry points for graft's native Catalyst expressions
  * and typed aggregates. Expressions are built directly into the plan
  * (no temp-function registry), so they resolve identically under any
  * session — including the cloned sessions streaming micro-batches
  * analyze under, where name-based resolution broke (see
  * [[org.apache.spark.sql.graftshim.ColumnShim]]).
  */
object Native {
  private def e(c: Column) = ColumnShim.expression(c)

  /** Exact DECIMAL(30,18)-quantized dot product as double. */
  def exactDot(a: Column, b: Column): Column =
    ColumnShim.column(ExactDotExpr(e(a), e(b)))

  /** Plain left-to-right double dot product. */
  def plainDot(a: Column, b: Column): Column =
    ColumnShim.column(PlainDotExpr(e(a), e(b)))

  /** Certified `exactDot(a, b) > 0` (exact fallback when uncertain). */
  def exactDotPositive(a: Column, b: Column): Column =
    ColumnShim.column(ExactDotPositiveExpr(e(a), e(b)))

  /** Exact DECIMAL(38,18) squared-L2 distance (null-term skipping). */
  def exactL2(a: Column, b: Column): Column =
    ColumnShim.column(ExactL2DistExpr(e(a), e(b)))

  /** Distinct word n-gram shingles from a token array. */
  def shingles(toks: Column, n: Int): Column =
    ColumnShim.column(ShinglesExpr(e(toks),
      org.apache.spark.sql.catalyst.expressions.Literal(n)))

  /** Winnowing fingerprint selection from a token array. */
  def winnow(toks: Column, k: Int, w: Int): Column =
    ColumnShim.column(WinnowExpr(e(toks),
      org.apache.spark.sql.catalyst.expressions.Literal(k),
      org.apache.spark.sql.catalyst.expressions.Literal(w)))

  /** Single-pass exact Gram upper triangle (aggregate). */
  def gramAgg(vec: Column, dim: Int): Column =
    ColumnShim.column(GramAgg(e(vec), dim).toAggregateExpression())

  /** Single-pass exact per-dimension sums (aggregate). */
  def dimSumsAgg(vec: Column, dim: Int): Column =
    ColumnShim.column(DimSumsAgg(e(vec), dim).toAggregateExpression())

  /** Element-wise max over packed HLL register arrays (aggregate). */
  def regMaxAgg(regs: Column, width: Int): Column =
    ColumnShim.column(RegMaxAgg(e(regs), width).toAggregateExpression())

  /** (used, harmonic sum) from a packed HLL register array. */
  def regStats(regs: Column): Column =
    ColumnShim.column(RegStatsExpr(e(regs)))
}

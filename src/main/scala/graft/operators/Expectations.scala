package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the "expectations" contract every
  * production ingest runs before a batch is allowed into the corpus —
  * the formalization of `clean_data.py`'s ad-hoc null checks).
  *
  * All checks against one table compile into ONE pass: each check is a
  * scalar aggregate expression, they evaluate together in a single
  * 1-row HashAggregate over a single scan, and the report unpivots that
  * row — auditing 50 columns costs one read of the table, not 50.
  * (The exception is `Unique`, whose `count(distinct)` triggers
  * Spark's Expand when mixed with other distinct aggregates — one extra
  * shuffle per distinct column, still one scan.)
  *
  * Report row: `check, column, observed, threshold, pass` — `observed`
  * is the measured fraction/ratio, `pass` the verdict, so the report is
  * both a gate (`pass` conjunction) and a drift log (observed values
  * over time).
  */
object Expectations {

  sealed trait Check {
    def column: String
    def name: String
    /** (observed aggregate, threshold, pass-predicate on observed) */
    def compiled: (Column, Double, Column => Column)
  }

  /** Null fraction of `column` must be <= `maxNullFrac`. */
  final case class NotNull(column: String, maxNullFrac: Double = 0.0)
      extends Check {
    val name = "not_null"
    def compiled = (
      sum(col(column).isNull.cast("long")).cast("double") / count(lit(1)),
      maxNullFrac, _ <= lit(maxNullFrac))
  }

  /** Fraction of non-null values inside [lo, hi] must be >= `minFrac`. */
  final case class InRange(column: String, lo: Double, hi: Double,
      minFrac: Double = 1.0) extends Check {
    val name = "in_range"
    def compiled = (
      sum((col(column) >= lo && col(column) <= hi).cast("long")).cast("double")
        / sum(col(column).isNotNull.cast("long")),
      minFrac, _ >= lit(minFrac))
  }

  /** Distinct-over-count ratio must be >= `minRatio` (1.0 = a true key). */
  final case class Unique(column: String, minRatio: Double = 1.0)
      extends Check {
    val name = "unique"
    def compiled = (
      countDistinct(col(column)).cast("double") / count(lit(1)),
      minRatio, _ >= lit(minRatio))
  }

  /** Fraction of non-null values matching `regex` must be >= `minFrac`. */
  final case class MatchesRegex(column: String, regex: String,
      minFrac: Double = 1.0) extends Check {
    val name = "matches_regex"
    def compiled = (
      sum(col(column).rlike(regex).cast("long")).cast("double")
        / sum(col(column).isNotNull.cast("long")),
      minFrac, _ >= lit(minFrac))
  }

  /** Accepted-values check: fraction of non-null values in `allowed`
    * must be >= `minFrac`.
    */
  final case class InSet(column: String, allowed: Seq[String],
      minFrac: Double = 1.0) extends Check {
    val name = "in_set"
    def compiled = (
      sum(col(column).cast("string").isin(allowed: _*).cast("long"))
        .cast("double") / sum(col(column).isNotNull.cast("long")),
      minFrac, _ >= lit(minFrac))
  }

  /** Row-level quarantine router: each rule is (name, pass-predicate);
    * rows failing ANY rule route to the reject side with the ordered
    * list of failed rule names in `reject_reasons`. The audit
    * ([[audit]]) tells you IF a batch is sick; this splits the batch
    * so the healthy rows still ship and the rejects land in a
    * quarantine table with their diagnosis — the standard ingest
    * topology.
    *
    * One narrow map computes the reasons array; the two sides are two
    * filters over it (Spark computes each branch from the same scan —
    * cache upstream if the input is expensive). Null predicate results
    * count as FAILURES: a rule that cannot evaluate must not wave the
    * row through.
    */
  def quarantine(
      df: DataFrame, rules: Seq[(String, Column)])
      : (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "quarantine needs at least one rule")
    val reasons = array(rules.map { case (n, p) =>
      when(coalesce(p, lit(false)), lit(null: String)).otherwise(lit(n))
    }: _*)
    val tagged = df.withColumn("reject_reasons",
      filter(reasons, r => r.isNotNull))
    (tagged.where(size(col("reject_reasons")) === 0).drop("reject_reasons"),
      tagged.where(size(col("reject_reasons")) > 0))
  }

  /** One-pass quarantine report: per rule the failing-row count, plus
    * a `__clean__` row counting rows passing every rule. The gate's
    * dashboard — same single-scan discipline as [[audit]].
    */
  def quarantineReport(
      df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "quarantine needs at least one rule")
    val aggs = rules.map { case (n, p) =>
      sum(when(coalesce(p, lit(false)), 0L).otherwise(1L)).as(s"__f_$n")
    } :+ sum(when(rules.map(r => coalesce(r._2, lit(false)))
      .reduce(_ && _), 1L).otherwise(0L)).as("__clean")
    val one = df.agg(aggs.head, aggs.tail: _*)
    rules.map { case (n, _) =>
      one.select(lit(n).as("rule"), col(s"__f_$n").as("n_rows"))
    }.reduce(_ unionAll _)
      .unionAll(one.select(lit("__clean__").as("rule"),
        col("__clean").as("n_rows")))
      .orderBy(col("rule"))
  }

  /** Run all checks in one pass; report one row per check, ordered by
    * (check, column) for determinism.
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      c.compiled._1.as(s"__m$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      val (_, threshold, passFn) = c.compiled
      struct(
        lit(c.name).as("check"), lit(c.column).as("column"),
        col(s"__m$i").as("observed"), lit(threshold).as("threshold"),
        coalesce(passFn(col(s"__m$i")), lit(false)).as("pass"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check"), col("r.column"), col("r.observed"),
        col("r.threshold"), col("r.pass"))
      .orderBy(col("check"), col("column"))
  }

  /** One referential-integrity check: child rows whose `childKey` value
    * has no match in `parent.parentKey`. NULL foreign keys are reported
    * separately (`n_null`), not as orphans — SQL FK semantics, where a
    * NULL reference is "absent", not "dangling".
    */
  final case class FkCheck(
      name: String,
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String)

  /** Referential-integrity audit across FK edges of a star schema: one
    * row per check — total child rows, NULL references, orphans
    * (non-null childKey absent from parent), orphan fraction over
    * non-null references, pass (zero orphans).
    *
    * Scale shape: each check is one LEFT ANTI join on the key — the
    * parent side collapses to DISTINCT keys first, so a dimension
    * parent broadcasts and a fact-fact edge shuffles only keys, never
    * payloads. The per-check results are one-row aggregates unioned at
    * the end (driver-free).
    */
  def fkAudit(checks: Seq[FkCheck]): DataFrame = {
    require(checks.nonEmpty, "fkAudit needs at least one check")
    checks.map { c =>
      val base = c.child.select(col(c.childKey).as("__k"))
      val totals = base.agg(
        count(lit(1)).as("n_child"),
        sum(when(col("__k").isNull, 1L).otherwise(0L)).as("n_null"))
      val orphans = base.filter(col("__k").isNotNull)
        .join(c.parent.select(col(c.parentKey).as("__k")).distinct(),
          Seq("__k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      totals.crossJoin(orphans).select(
        lit(c.name).as("fk"),
        col("n_child"), col("n_null"), col("n_orphans"),
        (col("n_orphans").cast("double")
          / greatest(col("n_child") - col("n_null"), lit(1L)))
          .as("orphan_frac"),
        (col("n_orphans") === 0L).as("pass"))
    }.reduce(_.unionByName(_)).orderBy(col("fk"))
  }
}

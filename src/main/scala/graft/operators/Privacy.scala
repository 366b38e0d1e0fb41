package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy audits for datasets about to leave a trust boundary
  * (training-data exports, analyst extracts): k-anonymity equivalence
  * classes and l-diversity of a sensitive attribute. The redaction
  * side (Luhn card scrub) lives in [[graft.functions.LuhnExpr]]; these
  * are the measurement side.
  */
object Privacy {

  /** k-anonymity / l-diversity audit: group by the quasi-identifier
    * columns, and per equivalence class report its size, whether it
    * violates k-anonymity (size < k), the number of DISTINCT sensitive
    * values (the class's l-diversity), and whether it violates
    * l-diversity (distinct sensitive < l). A released row is
    * re-identifiable in proportion to 1/size; a class with one
    * sensitive value leaks the attribute even when k holds.
    *
    * Shape: one hash aggregate on the quasi-identifier tuple (the
    * class count-distinct is a per-group agg, not a global one). The
    * output is one row per equivalence class — by construction at most
    * the quasi-identifier domain product, i.e. tiny relative to the
    * input.
    */
  def kAnonymityAudit(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1 && l >= 1)
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_diversity"))
      .withColumn("k_violation", col("class_size") < k)
      .withColumn("l_violation", col("l_diversity") < l)
  }

  /** Corpus-level privacy summary over the audit: total classes and
    * rows, rows in k-violating classes (the at-risk mass), worst-case
    * class size, and the count of l-violating classes. One broadcastable
    * row — the release gate's dashboard number.
    */
  def kAnonymitySummary(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      k: Int, l: Int): DataFrame = {
    kAnonymityAudit(df, quasiCols, sensitiveCol, k, l)
      .agg(
        count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"),
        sum(when(col("k_violation"), col("class_size")).otherwise(0L))
          .as("rows_at_risk"),
        min(col("class_size")).as("min_class_size"),
        sum(when(col("l_violation"), 1L).otherwise(0L))
          .as("classes_low_diversity"))
  }

  /** t-closeness audit (Li et al. 2007) for a CATEGORICAL sensitive
    * attribute: per quasi-identifier class, the total-variation
    * distance 0.5·Σ_v |p_class(v) − p_global(v)| between the class's
    * sensitive distribution and the corpus-wide one — the refinement
    * l-diversity misses (a class can be diverse yet skewed toward a
    * revealing value). Classes with tvd > t violate.
    *
    * Shape: (class, value) counts in one aggregate; the dense
    * class×value grid comes from a BROADCAST of the O(|values|) global
    * distribution (absent pairs contribute p_global), so nothing
    * all-pairs ever forms. Per-value terms floor-snap at 12 and
    * decimal-accumulate (doubles ≤ 1, far under every precision
    * hazard).
    */
  def tClosenessAudit(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      t: Double): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(t > 0 && t < 1, s"t must be in (0,1), got $t")
    val q = quasiCols.map(col)
    val cls = df.groupBy(q: _*).agg(count(lit(1)).as("class_size"))
    val cv = df.groupBy(q :+ col(sensitiveCol).as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val gv = df.groupBy(col(sensitiveCol).as("__v"))
      .agg(count(lit(1)).as("__g"))
    val tot = gv.agg(sum(col("__g")).as("__tot"))
    val grid = cls.crossJoin(broadcast(gv)).crossJoin(broadcast(tot))
      .join(cv, quasiCols :+ "__v", "left")
    val term = abs(coalesce(col("__c"), lit(0L)).cast("double")
      / col("class_size").cast("double")
      - col("__g").cast("double") / col("__tot").cast("double"))
    grid
      .withColumn("__term",
        (floor(term * lit(1e12)) / lit(1e12)).cast("decimal(38,12)"))
      .groupBy(q :+ col("class_size"): _*)
      .agg((lit(0.5) * sum(col("__term")).cast("double")).as("__tvd"))
      .select(q :+ col("class_size") :+
        (floor(col("__tvd") * lit(1e12)) / lit(1e12)).as("tvd") :+
        (floor(col("__tvd") * lit(1e12)) / lit(1e12) > t)
          .as("t_violation"): _*)
  }

  /** Laplace-noised category counts, the release shape of a
    * differentially-private histogram (sensitivity 1, noise scale
    * 1/epsilon). The noise here is SEEDED, not random: u derives from
    * md5(category:seed) and maps through the Laplace inverse CDF —
    * the engine-wide determinism discipline (same as the hash
    * samplers), so releases are reproducible, replayable in any
    * engine, and testable. A production release under a real DP
    * budget must swap in calibrated randomness; the plan shape (one
    * hash aggregate + a pure projection) is identical.
    *
    * u is clamped away from the CDF's poles so ln() stays finite;
    * noisy_n rounds at 6 (counts ~1e4 put round-12 past double
    * precision).
    */
  def dpNoisyCounts(
      df: DataFrame, catCol: String, epsilon: Double,
      seed: Long): DataFrame = {
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    val u = (pmod(
      graft.functions.TextFunctions.md5Hash60(
        concat_ws(":", col(catCol).cast("string"), lit(seed))),
      lit(1000000L)).cast("double") + 0.5) / 1000000.0
    val uc = u - 0.5
    val noise = (-lit(1.0) / epsilon) * signum(uc) *
      log(lit(1.0) - lit(2.0) * abs(uc))
    df.groupBy(col(catCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("noisy_n", round(col("n") + noise, 6))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** HyperLogLog distinct-count sketching as pure dataflow — the
  * mergeable cardinality estimator for 100 TB streams where a
  * `count(distinct item)` would shuffle every distinct key. The
  * sketch state per group is m = 64 registers (one byte each); the
  * shuffle carries at most 64 rows per group regardless of input
  * size, and register tables from disjoint shards merge by `max` —
  * the same property `approx_count_distinct` exploits internally,
  * exposed here as an inspectable table so estimates can be audited
  * against exact counts (reference behavior: pandas `nunique`,
  * `/root/reference/src/eda/analyze_data.py:24` — this is its
  * at-scale replacement with an error contract).
  *
  * Determinism: the item hash is the engine-portable 60-bit md5
  * ([[TextFunctions.md5Hash60]]); bucket = low 6 bits, and the rank
  * rho = leading-zero count of the remaining 54 bits + 1, computed
  * from the length of the binary string (`bin`) rather than
  * floating log2 (exact at power-of-two boundaries). The harmonic
  * sum accumulates as the INTEGER sum of 2^(54 - M_j) — exact and
  * order-independent — and only the final estimate touches doubles,
  * in one fixed expression both engines fold identically.
  */
object Sketches {

  private val M = 64 // registers (p = 6)
  private val WidthBits = 54 // 60-bit hash minus 6 bucket bits
  private val Alpha = 0.709 // HLL bias constant for m = 64
  private val PowWidth = 18014398509481984.0 // 2^54

  /** Per-group HLL estimate with its exact check. Output per group:
    * (groupCol, used_registers, zero_registers, est, exact, rel_err);
    * `est` applies the standard small-range linear-counting
    * correction (E <= 2.5 m with empty registers). `est`/`rel_err`
    * floor-snapped at 1e6 so the double division is hash-stable.
    */
  def hllDistinct(df: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    val h = TextFunctions.md5Hash60(col(itemCol).cast("string"))
    val hashed = df
      .filter(col(itemCol).isNotNull)
      .select(col(groupCol).as("g"), h.as("__h"))
      .select(col("g"),
        pmod(col("__h"), lit(M.toLong)).as("__b"),
        expr(s"__h div ${M.toLong}").as("__w"))
    val rho = when(col("__w") === 0L, lit(WidthBits + 1))
      .otherwise(lit(WidthBits + 1) - length(bin(col("__w"))))
    val regs = hashed
      .groupBy(col("g"), col("__b"))
      .agg(max(rho).cast("int").as("__m"))
    val perGroup = regs
      .groupBy(col("g"))
      .agg(
        count(lit(1)).cast("int").as("used_registers"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $WidthBits - __m)"))
          .as("__sum"))
      .withColumn("zero_registers", lit(M) - col("used_registers"))
      // empty registers contribute 2^-0 = 1 to the harmonic sum,
      // i.e. 2^54 each on the integer scale
      .withColumn("__s",
        col("__sum") + col("zero_registers").cast("long") * lit(PowWidth.toLong))
      .withColumn("__raw",
        lit(Alpha * M * M * PowWidth) / col("__s").cast("double"))
      .withColumn("__est",
        when(col("__raw") <= lit(2.5 * M) && col("zero_registers") > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / col("zero_registers").cast("double")))
          .otherwise(col("__raw")))
    val exact = df
      .filter(col(itemCol).isNotNull)
      .groupBy(col(groupCol).as("g"))
      .agg(countDistinct(col(itemCol)).as("exact"))
    perGroup.join(exact, Seq("g"))
      .select(col("g").as(groupCol),
        col("used_registers"), col("zero_registers"),
        (floor(col("__est") * 1e6) / 1e6).as("est"),
        col("exact"),
        (floor(abs(col("__est") - col("exact").cast("double"))
          / col("exact").cast("double") * 1e6) / 1e6).as("rel_err"))
  }
}

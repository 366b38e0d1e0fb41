package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IP-network operators: CIDR block parsing and containment joins.
  *
  * The reference geolocates transactions by joining each IP against an
  * ip-range table (reference `src/preprocessing/merge_data.py:8-23`, a
  * per-row binary search over [lower, upper] bounds). [[RangeJoin]]
  * covers the sorted-interval form of that lookup; this object covers
  * the other common encoding of the same data — CIDR blocks
  * ("a.b.c.d/p") — with a containment join whose shuffle key is a
  * fixed-width address prefix rather than an interval endpoint.
  *
  * Scale shape: a naive ip-in-[lo,hi] theta-join is a cross product at
  * 100 TB. Instead each block is expanded to the /16 prefixes it
  * covers (one row for p >= 16; 2^(16-p) rows for wider blocks — a
  * bounded, data-independent fan-out) and the join becomes an
  * equi-join on `ip >> 16` followed by a cheap residual range filter.
  * Both sides shuffle-partition uniformly on the prefix, so skew is
  * bounded by true address-space hot spots, not by block width.
  */
object Network {

  /** lo/hi unsigned-int bounds of a CIDR string column "a.b.c.d/p":
    * lo = base with the 32-p host bits cleared, hi = lo + 2^(32-p) - 1.
    * Bit clears are done with shifts on longs (no sign traps below
    * 2^32). Malformed input yields nulls (ANSI-safe try casts).
    */
  def cidrBounds(cidr: Column): Column = {
    val base = graft.functions.IpFunctions.ipToInt(
      substring_index(cidr, "/", 1))
    val p = substring_index(cidr, "/", -1).cast("int")
    // 2^(32-p) is exact in double far below 2^53; host-bit clear via
    // modular arithmetic (shift builtins need a literal shift count)
    val size = pow(lit(2.0), (lit(32) - p).cast("double")).cast("long")
    val lo = base - pmod(base, size)
    val hi = lo + size - 1
    when(p.between(0, 32) && base.isNotNull,
      struct(lo.as("lo"), hi.as("hi"), p.as("prefix_len")))
  }

  /** Containment join of integer IPs to CIDR blocks.
    *
    * @param ips      rows carrying an integer IPv4 column
    * @param ipIntCol IP as unsigned-int-in-long (see
    *                 [[graft.functions.IpFunctions.ipToInt]])
    * @param blocks   CIDR table; every column is kept on the output
    * @param cidrCol  block column holding "a.b.c.d/p" strings
    *
    * Inner join: IPs matching no block are dropped; overlapping blocks
    * each match (the caller dedups by specificity if CIDRs nest — see
    * [[mostSpecific]]).
    */
  def cidrJoin(
      ips: DataFrame,
      ipIntCol: String,
      blocks: DataFrame,
      cidrCol: String): DataFrame = {
    val b = blocks
      .withColumn("__b", cidrBounds(col(cidrCol)))
      .filter(col("__b").isNotNull)
      .select(col("*"), col("__b.lo").as("__lo"), col("__b.hi").as("__hi"),
        col("__b.prefix_len").as("prefix_len"))
      .drop("__b")
      // covering /16 prefixes: contiguous, so a sequence — bounded by
      // 2^(16-p) rows per block, 1 row for any block /16 or narrower
      .withColumn("__pfx",
        explode(sequence(shiftright(col("__lo"), 16),
          shiftright(col("__hi"), 16))))
    ips
      .withColumn("__pfx", shiftright(col(ipIntCol), 16))
      .join(b, Seq("__pfx"))
      .filter(col(ipIntCol).between(col("__lo"), col("__hi")))
      .drop("__pfx", "__lo", "__hi")
  }

  /** Of overlapping (nested) CIDR matches, keep each IP row's longest
    * prefix — the routing-table tie-break. `idCols` identify one input
    * IP row (e.g. the event id).
    */
  def mostSpecific(
      joined: DataFrame,
      idCols: Seq[String],
      prefixLenCol: String,
      tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(idCols.map(col): _*)
      .orderBy(col(prefixLenCol).desc, tieBreak)
    joined.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk")
  }
}

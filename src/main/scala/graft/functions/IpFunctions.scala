package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** IPv4 conversion functions (reference `src/preprocessing/clean_data.py:44-61`).
  *
  * The reference applies a Python row-wise lambda; here both directions are
  * pure `Column` expression trees so they stay inside whole-stage codegen
  * and Catalyst can constant-fold / null-propagate through them. No UDF.
  *
  * Semantics (clean_data.py:44-53 `ip_to_int`):
  *   - dotted-quad "a.b.c.d" with each octet 0-255 -> big-endian uint32
  *     (inet_aton): a*2^24 + b*2^16 + c*2^8 + d, as LongType (values
  *     exceed Int range);
  *   - otherwise numeric strings, incl. scientific notation "3.2e9", via
  *     int(float(s)) i.e. parse-as-double then truncate toward zero;
  *   - otherwise null.
  *
  * Documented deviation: inet_aton's archaic short forms ("1.2.3" =
  * 1.2.0.3, hex/octal octets) are NOT accepted — only canonical
  * dotted-quads. The fraud datasets carry full quads or numeric floats,
  * so the short forms never occur in practice.
  */
object IpFunctions {

  /** Octet = 0-255 without leading-garbage; anchored quad. */
  private val Ipv4Regex =
    "^\\s*((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[0-9][0-9]?)\\.){3}" +
      "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[0-9][0-9]?)\\s*$"

  /** Dotted-quad or numeric string -> uint32 as Long; null if unparseable. */
  def ipToInt(ip: Column): Column = {
    val s = trim(ip.cast("string"))
    val parts = split(s, "\\.")
    val quad = parts.getItem(0).cast("long") * lit(16777216L) +
      parts.getItem(1).cast("long") * lit(65536L) +
      parts.getItem(2).cast("long") * lit(256L) +
      parts.getItem(3).cast("long")
    // try_cast string->double yields null on garbage (ANSI-safe, matching
    // errors='coerce'); double->long truncates toward zero like int(float(s)).
    when(s.rlike(Ipv4Regex), quad)
      .otherwise(s.try_cast(DoubleType).try_cast(LongType))
  }

  /** uint32 -> dotted-quad string (clean_data.py:55-61 `int_to_ip`). */
  def intToIp(ip: Column): Column = {
    val v = ip.cast("long")
    concat_ws(".",
      shiftright(v, 24).bitwiseAND(lit(255L)),
      shiftright(v, 16).bitwiseAND(lit(255L)),
      shiftright(v, 8).bitwiseAND(lit(255L)),
      v.bitwiseAND(lit(255L)))
  }
}

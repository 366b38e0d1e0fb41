package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for `ip_to_int` (reference
  * `clean_data.py:44-53`) — the codegen'd form of
  * [[IpFunctions.ipToInt]]. One virtual call per row instead of the
  * regex + split + four casts of the pure-Column composition; identical
  * semantics (dotted-quad big-endian, numeric-string fallback via
  * truncate-toward-zero, null on garbage).
  *
  * Registered as SQL function `graft_ip_to_int` by [[GraftExtensions]].
  */
case class IpToIntExpr(child: Expression) extends UnaryExpression {

  // input contract: a string child (GraftExtensions wraps non-string
  // arguments in a cast at registration time)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    IpToIntExpr.parseBoxed(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("ipParsed")
      s"""
         |java.lang.Long $tmp = graft.functions.IpToIntExpr.parseBoxed($c.toString());
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_ip_to_int"
}

object IpToIntExpr {
  /** Single-pass parser, no regex: four dot-separated octets 0-255 ->
    * big-endian uint32; otherwise Python-`int(float(s))` semantics;
    * otherwise null. Called from generated code — must stay public.
    */
  def parseBoxed(raw: String): java.lang.Long = {
    val s = raw.trim
    var acc = 0L
    var octet = -1L
    var digits = 0
    var octets = 0
    var i = 0
    var dotted = true
    // octet rule mirrors IpFunctions.Ipv4Regex: 1-2 digits free-form,
    // 3 digits only for 100-255 (no 3-digit leading zeros)
    def octetOk: Boolean =
      octet >= 0 && (digits <= 2 || (digits == 3 && octet >= 100 && octet <= 255))
    while (i < s.length && dotted) {
      val ch = s.charAt(i)
      if (ch >= '0' && ch <= '9') {
        octet = (if (octet < 0) 0L else octet) * 10 + (ch - '0')
        digits += 1
        if (octet > 255 || digits > 3) dotted = false
      } else if (ch == '.') {
        if (!octetOk || octets == 3) dotted = false
        else { acc = (acc << 8) | octet; octet = -1; digits = 0; octets += 1 }
      } else dotted = false
      i += 1
    }
    if (dotted && octets == 3 && octetOk)
      java.lang.Long.valueOf((acc << 8) | octet)
    else {
      // fallback: int(float(s)) — parse as double, truncate toward zero;
      // out-of-long-range values yield null (mirroring try_cast under
      // ANSI) rather than saturating to Long.MaxValue
      try {
        val d = java.lang.Double.parseDouble(s)
        if (d.isNaN || d.isInfinite ||
          d < Long.MinValue.toDouble || d > Long.MaxValue.toDouble) null
        else java.lang.Long.valueOf(d.toLong)
      } catch { case _: NumberFormatException => null }
    }
  }
}

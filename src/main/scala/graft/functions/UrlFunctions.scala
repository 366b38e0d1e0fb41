package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL parsing and canonicalization for crawl curation — all pure
  * `Column` expression trees (regex extracts + array ops), no UDFs, so
  * the whole canonicalization stays inside whole-stage codegen and the
  * DuckDB oracle can replay it with the same regexes.
  *
  * The canonical form follows the common crawl-dedup conventions:
  * lower-cased scheme and host, `www.` prefix stripped, default ports
  * (http:80 / https:443) dropped, empty path normalized to `/`,
  * tracking parameters (`utm_*`, `gclid`, `fbclid`, `ref`) removed,
  * remaining query params sorted byte-wise, fragment dropped.
  */
object UrlFunctions {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val AuthRe   = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PathRe   = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

  def scheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  /** Host without userinfo or port, lower-cased. */
  def host(url: Column): Column = {
    val auth = regexp_extract(url, AuthRe, 1)
    lower(regexp_extract(auth, "(?:[^@]*@)?([^:]*)", 1))
  }

  /** Explicit port string ("" when none). */
  def port(url: Column): Column = {
    val auth = regexp_extract(url, AuthRe, 1)
    regexp_extract(auth, ":([0-9]+)$", 1)
  }

  def path(url: Column): Column = {
    val p = regexp_extract(url, PathRe, 1)
    when(p === "", lit("/")).otherwise(p)
  }

  def query(url: Column): Column = regexp_extract(url, "\\?([^#]*)", 1)

  /** Query string with tracking params removed and the rest sorted
    * byte-wise — `b=2&utm_source=x&a=1` → `a=1&b=2`.
    */
  def canonicalQuery(url: Column): Column = {
    val kept = filter(split(query(url), "&"), p =>
      !(p === "" || p.startsWith("utm_") || p.startsWith("gclid=") ||
        p.startsWith("fbclid=") || p.startsWith("ref=")))
    array_join(array_sort(kept), "&")
  }

  /** Full canonical URL (see object doc for the conventions). A value
    * with no `scheme://` prefix is not a URL this canonicalizer can
    * normalize — it yields NULL rather than a `'://…'` fragment, so
    * malformed crawl records surface as nulls a pipeline can count.
    */
  def canonicalizeUrl(url: Column): Column = {
    val sch = scheme(url)
    val h = regexp_replace(host(url), "^www\\.", "")
    val prt = port(url)
    val keepPort = prt =!= "" &&
      !((sch === "https" && prt === "443") || (sch === "http" && prt === "80"))
    val q = canonicalQuery(url)
    when(sch === "", lit(null).cast("string")).otherwise(concat(
      sch, lit("://"), h,
      when(keepPort, concat(lit(":"), prt)).otherwise(lit("")),
      path(url),
      when(q =!= "", concat(lit("?"), q)).otherwise(lit(""))))
  }

  /** Registrable domain (eTLD+1) of a host, with a caller-supplied set
    * of two-label public suffixes (`co.uk`, `com.au`, …): the last two
    * labels, or the last three when the last two form a listed suffix.
    * A one-label host is returned as-is. Not a full PSL — the suffix
    * list travels as a literal array the caller controls.
    */
  def registrableDomain(hostCol: Column, twoLabelSuffixes: Seq[String]): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val last2 = concat(element_at(labels, n - 1), lit("."), element_at(labels, n))
    val last3 = concat(element_at(labels, n - 2), lit("."), last2)
    when(n <= 1, hostCol)
      .when(n >= 3 && array_contains(
        array(twoLabelSuffixes.map(lit): _*), last2), last3)
      .otherwise(last2)
  }
}

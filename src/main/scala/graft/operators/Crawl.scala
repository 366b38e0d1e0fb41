package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions

/** Crawl-frontier operators — the decision layer between a URL list
  * and the fetcher: which URLs MAY be fetched (robots-style
  * longest-prefix path rules) and WHEN (per-host politeness
  * scheduling). Reference scope: the reference pipeline ingests flat
  * files; these are the beyond-reference operators a web-scale
  * corpus-collection stage needs, built on [[graft.functions.UrlFunctions]]'
  * parsing.
  *
  * Scale shape: everything is keyed by host — the rule table is
  * rule-corpus-sized (broadcast), the per-URL work is one broadcast
  * join plus a per-URL window, and the politeness schedule is a
  * per-host window with no global ordering anywhere. 100 TB of URLs
  * partition by host hash and never meet.
  */
object Crawl {

  /** Parse raw robots.txt bodies into the (host, user_agent, prefix,
    * allow) rule table [[robotsDecision]] consumes — the step a
    * frontier actually starts from. RFC 9309 semantics:
    *
    *  - `#` starts a comment; directive names are case-insensitive;
    *    values trim surrounding whitespace; `\r` is stripped (CRLF
    *    bodies parse identically).
    *  - a GROUP is a run of consecutive `User-agent:` lines followed
    *    by its rules; a `User-agent:` line after rules starts a NEW
    *    group; rules apply to every agent named in their group's run.
    *  - lines other than user-agent/allow/disallow (crawl-delay,
    *    sitemap, garbage) are transparent — they neither join nor
    *    split a group (the RFC's "other records" rule).
    *  - an EMPTY `Disallow:` value means "no restriction" and emits
    *    no rule (likewise empty Allow); rules before any user-agent
    *    line belong to no group and are dropped.
    *
    * Shape: one line explode, two per-host windows (lag to find group
    * starts, running sum to number groups), one group-local
    * agents x rules join — per-host parallel, robots corpora are
    * host-cardinality-sized. Output: distinct (host, user_agent
    * lowercased, prefix, allow).
    */
  def parseRobots(
      df: DataFrame, hostCol: String, textCol: String): DataFrame = {
    val lines = df
      .select(col(hostCol).as("host"),
        posexplode(split(regexp_replace(col(textCol), "\r", ""), "\n"))
          .as(Seq("__pos", "__raw")))
      .withColumn("__line", regexp_replace(
        regexp_replace(col("__raw"), "#.*", ""), "^\\s+|\\s+$", ""))
      .withColumn("__dir",
        lower(regexp_extract(col("__line"), "^([A-Za-z-]+)\\s*:", 1)))
      .withColumn("__val", regexp_replace(
        regexp_extract(col("__line"), "^[A-Za-z-]+\\s*:\\s*(.*)$", 1),
        "\\s+$", ""))
      .filter(col("__dir").isin("user-agent", "allow", "disallow"))
    val wOrd = Window.partitionBy(col("host")).orderBy(col("__pos"))
    val isUa = col("__dir") === "user-agent"
    val grouped = lines
      .withColumn("__prev", lag(col("__dir"), 1).over(wOrd))
      .withColumn("__ng",
        when(isUa && (col("__prev").isNull
          || col("__prev") =!= "user-agent"), 1L).otherwise(0L))
      .withColumn("__g", sum(col("__ng")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val agents = grouped.filter(isUa && col("__val") =!= "")
      .select(col("host"), col("__g"),
        lower(col("__val")).as("user_agent"))
      .distinct()
    val rules = grouped.filter(!isUa && col("__val") =!= "")
      .select(col("host"), col("__g"),
        col("__val").as("prefix"), (col("__dir") === "allow").as("allow"))
    agents.join(rules, Seq("host", "__g"))
      .select(col("host"), col("user_agent"), col("prefix"), col("allow"))
      .distinct()
  }

  /** Group selection for one crawler identity (RFC 9309 group
    * inheritance): a host that names `agent` explicitly contributes
    * ONLY that agent's rules; otherwise its `*` group applies; a host
    * naming neither contributes nothing (every URL there defaults to
    * allow in [[robotsDecision]]). Output (host, prefix, allow) —
    * exactly [[robotsDecision]]'s `rules` input.
    */
  def rulesForAgent(parsed: DataFrame, agent: String): DataFrame = {
    val a = agent.toLowerCase
    val hostsWithAgent = parsed.filter(col("user_agent") === a)
      .select(col("host")).distinct()
      .withColumn("__named", lit(true))
    parsed
      .join(broadcast(hostsWithAgent), Seq("host"), "left")
      .filter((col("user_agent") === a)
        || (col("__named").isNull && col("user_agent") === "*"))
      .select(col("host"), col("prefix"), col("allow"))
  }

  /** Longest-prefix fetch decision (the robots.txt match semantics):
    * for each URL, among the host's rules whose `prefix` is a prefix
    * of the URL path, the LONGEST prefix wins; on a length tie an
    * allow rule beats a disallow (the published robots convention);
    * a URL with no matching rule is allowed. `rules` is
    * (host, prefix, allow) — rule corpora are tiny next to frontiers,
    * so the join broadcasts.
    *
    * Output: (idCol, host, path, matched_prefix — "" when no rule
    * matched, allow).
    */
  def robotsDecision(
      urls: DataFrame, idCol: String, urlCol: String,
      rules: DataFrame): DataFrame = {
    val u = urls.select(col(idCol),
      UrlFunctions.host(col(urlCol)).as("host"),
      UrlFunctions.path(col(urlCol)).as("path"))
    val r = rules.select(col("host"), col("prefix"), col("allow"))
    val joined = u.join(broadcast(r),
      u("host") === r("host") && col("path").startsWith(col("prefix")),
      "left")
      .select(u(idCol), u("host"), col("path"), col("prefix"),
        col("allow"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(length(col("prefix")).desc, col("allow").desc)
    joined.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col(idCol), col("host"), col("path"),
        coalesce(col("prefix"), lit("")).as("matched_prefix"),
        coalesce(col("allow"), lit(true)).as("allow"))
  }

  /** Per-host politeness schedule: within each host, URLs fetch in
    * deterministic id order, one every `delayMs` — the standard
    * one-connection-per-host courtesy. Output: (idCol, hostCol,
    * host_rank starting at 1, fetch_offset_ms = (rank−1)·delayMs).
    * Purely per-host windows: hosts schedule independently and in
    * parallel, which is exactly how a distributed fetcher shards.
    */
  def frontierSchedule(
      urls: DataFrame, idCol: String, hostCol: String,
      delayMs: Long): DataFrame = {
    require(delayMs >= 0, s"delayMs must be >= 0, got $delayMs")
    val w = Window.partitionBy(col(hostCol)).orderBy(col(idCol))
    urls.select(col(idCol), col(hostCol))
      .withColumn("host_rank", row_number().over(w).cast("long"))
      .withColumn("fetch_offset_ms",
        (col("host_rank") - 1L) * lit(delayMs))
  }

  /** `Crawl-delay:` directives from raw robots.txt bodies, with the
    * same group attribution as [[parseRobots]] (the delay binds to the
    * agent group it appears under; it is a de-facto extension, not RFC
    * 9309, but every large crawler honors it). Non-numeric and
    * negative values are ignored; several delays in one group keep the
    * LARGEST (the conservative read). Output: (host, user_agent,
    * delay_s long).
    */
  def parseCrawlDelays(
      df: DataFrame, hostCol: String, textCol: String): DataFrame = {
    val lines = df
      .select(col(hostCol).as("host"),
        posexplode(split(regexp_replace(col(textCol), "\r", ""), "\n"))
          .as(Seq("__pos", "__raw")))
      .withColumn("__line", regexp_replace(
        regexp_replace(col("__raw"), "#.*", ""), "^\\s+|\\s+$", ""))
      .withColumn("__dir",
        lower(regexp_extract(col("__line"), "^([A-Za-z-]+)\\s*:", 1)))
      .withColumn("__val", regexp_replace(
        regexp_extract(col("__line"), "^[A-Za-z-]+\\s*:\\s*(.*)$", 1),
        "\\s+$", ""))
      .filter(col("__dir").isin("user-agent", "crawl-delay"))
    val wOrd = Window.partitionBy(col("host")).orderBy(col("__pos"))
    val isUa = col("__dir") === "user-agent"
    val grouped = lines
      .withColumn("__prev", lag(col("__dir"), 1).over(wOrd))
      .withColumn("__ng",
        when(isUa && (col("__prev").isNull
          || col("__prev") =!= "user-agent"), 1L).otherwise(0L))
      .withColumn("__g", sum(col("__ng")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val agents = grouped.filter(isUa && col("__val") =!= "")
      .select(col("host"), col("__g"),
        lower(col("__val")).as("user_agent"))
      .distinct()
    val delays = grouped.filter(!isUa)
      .select(col("host"), col("__g"),
        // try_cast, not cast: junk values ("Crawl-delay: soon") are
        // ignored per the scaladoc, never an ANSI cast error
        col("__val").try_cast("long").as("delay_s"))
      .filter(col("delay_s").isNotNull && col("delay_s") >= 0)
    agents.join(delays, Seq("host", "__g"))
      .groupBy(col("host"), col("user_agent"))
      .agg(max(col("delay_s")).as("delay_s"))
  }

  /** Delay selection for one crawler identity — the
    * [[rulesForAgent]] inheritance applied to [[parseCrawlDelays]]
    * output: a host naming `agent` contributes only that group's
    * delay, otherwise its `*` delay; ties keep the largest. Output
    * (host, delay_s) — exactly [[frontierScheduleWithDelays]]'
    * `delays` input.
    */
  def delaysForAgent(parsed: DataFrame, agent: String): DataFrame = {
    val a = agent.toLowerCase
    val named = parsed.filter(col("user_agent") === a)
      .select(col("host")).distinct()
      .withColumn("__named", lit(true))
    parsed
      .join(broadcast(named), Seq("host"), "left")
      .filter((col("user_agent") === a)
        || (col("__named").isNull && col("user_agent") === "*"))
      .groupBy(col("host"))
      .agg(max(col("delay_s")).as("delay_s"))
  }

  /** Per-host politeness schedule with PER-HOST delays — the
    * [[frontierSchedule]] arity a crawler that honors `Crawl-delay`
    * runs: `delays` is (host, delay_s), typically
    * [[parseCrawlDelays]] → [[rulesForAgent]]-style group selection;
    * hosts without a delay row use `defaultDelayMs`. Same shape as
    * the fixed-delay schedule — the delay table is
    * host-cardinality-sized and broadcasts.
    */
  def frontierScheduleWithDelays(
      urls: DataFrame, idCol: String, hostCol: String,
      delays: DataFrame, defaultDelayMs: Long): DataFrame = {
    require(defaultDelayMs >= 0,
      s"defaultDelayMs must be >= 0, got $defaultDelayMs")
    val w = Window.partitionBy(col(hostCol)).orderBy(col(idCol))
    urls.select(col(idCol), col(hostCol))
      .join(broadcast(delays.select(col("host").as(hostCol),
        (col("delay_s") * 1000L).as("__delay_ms"))), Seq(hostCol), "left")
      .withColumn("delay_ms",
        coalesce(col("__delay_ms"), lit(defaultDelayMs)))
      .withColumn("host_rank", row_number().over(w).cast("long"))
      .withColumn("fetch_offset_ms",
        (col("host_rank") - 1L) * col("delay_ms"))
      .select(col(idCol), col(hostCol), col("delay_ms"),
        col("host_rank"), col("fetch_offset_ms"))
  }

  /** `Sitemap:` directives from raw robots.txt bodies — the discovery
    * entry [[parseRobots]] deliberately treats as transparent (it is
    * not a group rule; RFC 9309 §2.3 makes it group-independent).
    * Directive name matches case-insensitively; the URL value keeps
    * its case (URLs are case-sensitive); comments/CRLF handled as in
    * [[parseRobots]]. Output: distinct (host, sitemap_url).
    */
  def sitemapDirectives(
      df: DataFrame, hostCol: String, textCol: String): DataFrame =
    df.select(col(hostCol).as("host"),
        explode(split(regexp_replace(col(textCol), "\r", ""), "\n"))
          .as("__raw"))
      .select(col("host"), regexp_replace(
        regexp_replace(col("__raw"), "#.*", ""), "^\\s+|\\s+$", "")
        .as("__line"))
      .filter(lower(regexp_extract(col("__line"), "^([A-Za-z-]+)\\s*:", 1))
        === "sitemap")
      .select(col("host"), regexp_replace(
        regexp_extract(col("__line"), "^[A-Za-z-]+\\s*:\\s*(.*)$", 1),
        "\\s+$", "").as("sitemap_url"))
      .filter(col("sitemap_url") =!= "")
      .distinct()

  /** Inventory of a sitemap XML body (sitemaps.org protocol): one row
    * per `<url>` entry of a urlset and per `<sitemap>` entry of a
    * sitemapindex — `loc` (entity-decoded for the five predefined XML
    * entities, whitespace-trimmed), optional `lastmod` (null when
    * absent), and `is_index` marking child-sitemap pointers that go
    * back onto the fetch frontier rather than into the corpus. Pure
    * Column regex/array work: one lazy-dotall block extraction, one
    * explode — no XML library, total over arbitrary text (a body with
    * no entries yields no rows).
    */
  def parseSitemap(
      df: DataFrame, hostCol: String, xmlCol: String): DataFrame = {
    def decode(c: Column): Column =
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(c,
          "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
        "&amp;", "&")
    def entries(tag: String, isIndex: Boolean) =
      df.select(col(hostCol).as("host"),
          explode(regexp_extract_all(col(xmlCol),
            lit(s"(?s)<$tag>(.*?)</$tag>"), lit(1))).as("__e"))
        .select(col("host"),
          decode(regexp_replace(
            regexp_extract(col("__e"), "(?s)<loc>(.*?)</loc>", 1),
            "^\\s+|\\s+$", "")).as("loc"),
          when(col("__e").rlike("(?s)<lastmod>"),
            regexp_replace(
              regexp_extract(col("__e"), "(?s)<lastmod>(.*?)</lastmod>", 1),
              "^\\s+|\\s+$", ""))
            .as("lastmod"),
          lit(isIndex).as("is_index"))
        .filter(col("loc") =!= "")
    entries("url", isIndex = false)
      .unionByName(entries("sitemap", isIndex = true))
  }

  /** URL-level corpus prefilter (the C4/RefinedWeb-style gate that
    * runs BEFORE any fetch): block by registrable domain (a broadcast
    * blocklist join — blocklists are list-sized, frontiers are not)
    * and by bad-word substring in the lowercased URL (the first
    * matching word IN LIST ORDER is reported, so the verdict is
    * deterministic and auditable). Output: (idCol, host, domain,
    * domain_blocked, bad_word — null when clean, keep). Everything is
    * one projection plus one broadcast join; the frontier never
    * shuffles.
    */
  def urlFilter(
      urls: DataFrame, idCol: String, urlCol: String,
      blockedDomains: DataFrame, badWords: Seq[String],
      twoLabelSuffixes: Seq[String] = Seq("co.uk", "com.au")): DataFrame = {
    val host = UrlFunctions.host(col(urlCol))
    val base = urls.select(col(idCol), col(urlCol), host.as("host"),
      UrlFunctions.registrableDomain(host, twoLabelSuffixes).as("domain"),
      lower(col(urlCol)).as("__lu"))
    val badWord = badWords.foldRight(lit(null).cast("string")) { (w, acc) =>
      when(col("__lu").contains(w.toLowerCase), lit(w.toLowerCase))
        .otherwise(acc)
    }
    base
      .join(broadcast(blockedDomains.select(col("domain"),
        lit(true).as("__blk"))), Seq("domain"), "left")
      .withColumn("domain_blocked", col("__blk").isNotNull)
      .withColumn("bad_word", badWord)
      .withColumn("keep",
        !col("domain_blocked") && col("bad_word").isNull)
      .select(col(idCol), col("host"), col("domain"),
        col("domain_blocked"), col("bad_word"), col("keep"))
  }
}

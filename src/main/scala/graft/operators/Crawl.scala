package graft.operators

import org.apache.spark.sql.DataFrame
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
}

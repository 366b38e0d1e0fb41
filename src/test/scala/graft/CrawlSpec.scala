package graft

import org.apache.spark.sql.functions._

import graft.operators.Crawl

class CrawlSpec extends SparkSpec {
  import spark.implicits._

  private def urls = Seq(
    (1L, "https://a.com/docs/guide"),   // longest prefix allows
    (2L, "https://a.com/docs/secret"),  // blocked by /docs/
    (3L, "https://a.com/open"),         // host has rules, none match
    (4L, "https://b.com/anything"),     // host has no rules at all
    (5L, "https://a.com/tie")           // same-length allow + disallow
  ).toDF("id", "url")

  private def rules = Seq(
    ("a.com", "/docs/", false),
    ("a.com", "/docs/g", true),
    ("a.com", "/tie", false),
    ("a.com", "/tie", true)
  ).toDF("host", "prefix", "allow")

  test("robotsDecision: longest prefix wins, allow wins length ties, " +
    "unmatched and rule-less hosts default to allow") {
    val got = Crawl.robotsDecision(urls, "id", "url", rules)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[String]("matched_prefix"), r.getAs[Boolean]("allow"))))
      .toMap
    assert(got(1L) === (("/docs/g", true)))  // 7 > 6 chars
    assert(got(2L) === (("/docs/", false)))
    assert(got(3L) === (("", true)))
    assert(got(4L) === (("", true)))
    assert(got(5L) === (("/tie", true)))     // allow beats disallow
  }

  test("frontierSchedule: per-host id-ordered ranks and offsets") {
    val allowed = Seq((3L, "a.com"), (1L, "a.com"), (9L, "b.com"),
      (2L, "a.com")).toDF("id", "host")
    val got = Crawl.frontierSchedule(allowed, "id", "host", delayMs = 500L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[Long]("host_rank"), r.getAs[Long]("fetch_offset_ms")))
      .toSet
    assert(got === Set(
      (1L, "a.com", 1L, 0L), (2L, "a.com", 2L, 500L),
      (3L, "a.com", 3L, 1000L), (9L, "b.com", 1L, 0L)))
  }
}

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

  test("parseRobots: UA runs group, transparent records don't split, " +
    "empty Disallow emits nothing, case/comments/CRLF handled, " +
    "orphan rules dropped") {
    val body =
      "# header comment\r\n" +
        "Disallow: /orphan/\r\n" + // before any UA: no group, dropped
        "User-Agent: *\r\n" +
        "Disallow: /private/   # trailing comment\r\n" +
        "Allow: /private/public/\r\n" +
        "\r\n" +
        "User-agent: GraftBot\r\n" +
        "user-agent: mirrorbot\r\n" + // stacked UA run: one group
        "DISALLOW: /tmp/\r\n" +
        "Disallow:\r\n" + // empty value: no restriction, no rule
        "Allow: /tmp/ok\r\n" +
        "Crawl-delay: 2\r\n" + // transparent: group continues
        "Disallow: /deep/\r\n" +
        "\r\n" +
        "Sitemap: https://h.com/sitemap.xml\r\n" + // transparent
        "User-agent: loner\r\n" +
        "Disallow: /all/\r\n" +
        "Disallow /no-colon\r\n" // malformed: ignored
    val parsed = Crawl.parseRobots(
      Seq(("h.com", body)).toDF("host", "txt"), "host", "txt")
    val rows = parsed.collect()
      .map(r => (r.getString(1), r.getString(2), r.getBoolean(3))).toSet
    assert(rows === Set(
      ("*", "/private/", false), ("*", "/private/public/", true),
      ("graftbot", "/tmp/", false), ("graftbot", "/tmp/ok", true),
      ("graftbot", "/deep/", false),
      ("mirrorbot", "/tmp/", false), ("mirrorbot", "/tmp/ok", true),
      ("mirrorbot", "/deep/", false),
      ("loner", "/all/", false)))
  }

  test("rulesForAgent: a host naming the agent contributes ONLY its " +
    "group; others fall back to *; decisions compose end to end") {
    val body =
      "User-agent: *\nDisallow: /private/\n\n" +
        "User-agent: graftbot\nDisallow: /tmp/\nAllow: /tmp/ok\n"
    val parsed = Crawl.parseRobots(
      Seq(("h.com", body), ("i.com", "User-agent: *\nDisallow: /x/\n"))
        .toDF("host", "txt"), "host", "txt")
    val forBot = Crawl.rulesForAgent(parsed, "GraftBot")
    val rows = forBot.collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    assert(rows === Set(
      ("h.com", "/tmp/", false), ("h.com", "/tmp/ok", true),
      ("i.com", "/x/", false)))

    val urls = Seq(
      (1L, "https://h.com/tmp/ok"), // longest prefix: allow
      (2L, "https://h.com/tmp/x"), // /tmp/ disallow
      (3L, "https://h.com/private/z"), // * group NOT inherited: allow
      (4L, "https://i.com/x/1") // fallback * group: disallow
    ).toDF("id", "url")
    val dec = Crawl.robotsDecision(urls, "id", "url", forBot)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("allow")).toMap
    assert(dec === Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
  }

  test("parseCrawlDelays + delaysForAgent + frontierScheduleWithDelays: " +
    "group attribution, max-of-group, junk ignored, named shadows *, " +
    "default for unlisted hosts") {
    val body =
      "User-agent: *\nCrawl-delay: 1\nDisallow: /x/\n\n" +
        "User-agent: graftbot\nCrawl-delay: 4\nCrawl-delay: 2\n" +
        "Crawl-delay: soon\nCrawl-delay: -3\n"
    val parsed = Crawl.parseCrawlDelays(
      Seq(("h.com", body),
        ("i.com", "User-agent: *\nCrawl-delay: 7\n"),
        ("j.com", "User-agent: *\nDisallow: /x/\n")) // no delay at all
        .toDF("host", "txt"), "host", "txt")
    val rows = parsed.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows === Set(
      ("h.com", "*", 1L), ("h.com", "graftbot", 4L), ("i.com", "*", 7L)))

    val delays = Crawl.delaysForAgent(parsed, "GraftBot")
    assert(delays.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("h.com" -> 4L, "i.com" -> 7L))

    val urls = Seq((1L, "h.com"), (2L, "h.com"), (3L, "i.com"),
      (4L, "k.com"), (5L, "k.com")).toDF("id", "host")
    val sched = Crawl.frontierScheduleWithDelays(
      urls, "id", "host", delays, defaultDelayMs = 500L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("delay_ms"), r.getAs[Long]("fetch_offset_ms"))))
      .toMap
    assert(sched === Map(
      1L -> ((4000L, 0L)), 2L -> ((4000L, 4000L)),
      3L -> ((7000L, 0L)),
      4L -> ((500L, 0L)), 5L -> ((500L, 500L))))
  }

  test("sitemapDirectives: case-insensitive directive, case-preserving " +
    "URL, comments stripped, group-independent") {
    val body =
      "User-agent: *\nDisallow: /x/\n" +
        "SITEMAP: https://H.com/CaseKept.xml # primary\n" +
        "User-agent: bot\nsitemap:   https://h.com/two.xml  \r\n" +
        "Sitemap:\n" + // empty value: dropped
        "Sitemap: https://h.com/two.xml\n" // duplicate: one row
    val got = Crawl.sitemapDirectives(
      Seq(("h.com", body)).toDF("host", "txt"), "host", "txt")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(
      ("h.com", "https://H.com/CaseKept.xml"),
      ("h.com", "https://h.com/two.xml")))
  }

  test("urlFilter: domain blocklist, list-ordered bad-word report, " +
    "public-suffix domains, default keep") {
    val urls = Seq(
      (1L, "https://news.example.co.uk/story"), // blocked domain
      (2L, "https://a.shop.com/buy?gclid=1&item=2"), // both words: gclid
      (3L, "https://b.shop.com/item/9"), // item only
      (4L, "http://localhost/fine"), // single-label host, clean
      (5L, "https://c.ok.org/page")) // clean
      .toDF("id", "url")
    val blocked = Seq("example.co.uk", "blocked.test").toDF("domain")
    val got = Crawl.urlFilter(urls, "id", "url", blocked,
      badWords = Seq("gclid", "item"))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("domain"), r.getAs[Boolean]("domain_blocked"),
          r.getAs[String]("bad_word"), r.getAs[Boolean]("keep")))).toMap
    assert(got(1L) === (("example.co.uk", true, null, false)))
    assert(got(2L) === (("shop.com", false, "gclid", false)))
    assert(got(3L) === (("shop.com", false, "item", false)))
    assert(got(4L) === (("localhost", false, null, true)))
    assert(got(5L) === (("ok.org", false, null, true)))
  }

  test("parseSitemap: urlset and sitemapindex entries, entity decode, " +
    "loc trim, nullable lastmod, non-XML yields nothing") {
    val urlset =
      """<?xml version="1.0"?><urlset>
        |<url><loc>
        |  https://h.com/p?a=1&amp;b=&lt;2&gt;
        |</loc><lastmod> 2024-01-02 </lastmod></url>
        |<url><loc>https://h.com/q</loc></url>
        |<url><loc></loc></url>
        |</urlset>""".stripMargin
    val index = "<sitemapindex><sitemap><loc>https://i.com/s1.xml</loc>" +
      "</sitemap><sitemap><loc>https://i.com/s2.xml</loc>" +
      "<lastmod>2024-02-03</lastmod></sitemap></sitemapindex>"
    val got = Crawl.parseSitemap(
      Seq(("h.com", urlset), ("i.com", index), ("j.com", "not xml"))
        .toDF("host", "xml"), "host", "xml")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), r.getBoolean(3))).toSet
    assert(got === Set(
      ("h.com", "https://h.com/p?a=1&b=<2>", Some("2024-01-02"), false),
      ("h.com", "https://h.com/q", None, false),
      ("i.com", "https://i.com/s1.xml", None, true),
      ("i.com", "https://i.com/s2.xml", Some("2024-02-03"), true)))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions

class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u")
      .select(UrlFunctions.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("tracking params are stripped, the rest sorted byte-wise, " +
    "fragment dropped") {
    assert(canon("https://a.com/p?b=2&utm_source=x&a=1&gclid=g&fbclid=f&ref=r#frag")
      === Seq("https://a.com/p?a=1&b=2"))
    // all params tracking -> no query at all
    assert(canon("https://a.com/p?utm_medium=m&utm_campaign=c")
      === Seq("https://a.com/p"))
    // a param NAMED like a tracking value but not matching stays
    // (refresh=1 is not ref=; utmx=1 is not utm_)
    assert(canon("https://a.com/p?refresh=1&utmx=1")
      === Seq("https://a.com/p?refresh=1&utmx=1"))
  }

  test("default ports drop, explicit non-default ports stay") {
    assert(canon("https://a.com:443/x", "http://a.com:80/x",
      "https://a.com:8443/x", "http://a.com:443/x")
      === Seq("https://a.com/x", "http://a.com/x",
        "https://a.com:8443/x", "http://a.com:443/x"))
  }

  test("scheme and host lowercase, www. strips, userinfo drops, " +
    "empty path becomes /") {
    assert(canon("HTTPS://WWW.Example.COM") === Seq("https://example.com/"))
    assert(canon("https://user:pw@a.com/x") === Seq("https://a.com/x"))
    // www strips only as a PREFIX label
    assert(canon("https://wwwx.com/") === Seq("https://wwwx.com/"))
  }

  test("scheme-less input canonicalizes to NULL, not a '://' fragment") {
    assert(canon("example.com/x", "not a url at all")
      === Seq(null, null))
  }

  test("registrableDomain: one-label, default two-label, listed " +
    "two-label public suffixes") {
    val got = Seq("localhost", "a.example.com", "deep.sub.example.co.uk",
      "example.co.uk", "b.site.com.au", "plain.org")
      .toDF("h")
      .select(UrlFunctions.registrableDomain(col("h"),
        Seq("co.uk", "com.au")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("localhost", "example.com", "example.co.uk",
      "example.co.uk", "site.com.au", "plain.org"))
  }

  test("component extractors: scheme/host/port/path/query") {
    val df = Seq("https://u@Host.Com:8080/a/b?x=1#f").toDF("u")
    val r = df.select(
      UrlFunctions.scheme(col("u")).as("s"),
      UrlFunctions.host(col("u")).as("h"),
      UrlFunctions.port(col("u")).as("p"),
      UrlFunctions.path(col("u")).as("pa"),
      UrlFunctions.query(col("u")).as("q")).collect().head
    assert(r.getString(0) === "https" && r.getString(1) === "host.com" &&
      r.getString(2) === "8080" && r.getString(3) === "/a/b" &&
      r.getString(4) === "x=1")
  }
}

package graft

import graft.operators.TextPrep
import org.apache.spark.sql.functions._

class TextPrepSpec extends SparkSpec {
  import spark.implicits._

  private def strip(html: String): String =
    Seq(Tuple1(html)).toDF("h")
      .select(TextPrep.stripHtml(col("h")).as("t"))
      .collect().head.getString(0)

  test("stripHtml: tags, quoted '>', script/style bodies, comments, " +
    "entities, block-tag line breaks") {
    assert(strip("<p>Hello <b>world</b></p>") === "Hello world")
    // an attribute value containing '>' does not end the tag
    assert(strip("""<div title="a>b">x</div>""") === "x")
    assert(strip("<div title='a>b'>x</div>") === "x")
    // script/style bodies vanish entirely, even with '<' inside
    assert(strip("<script>if (1 < 2) { x(); }</script><p>kept</p>")
      === "kept")
    assert(strip("""<script type="a>b">var s = "<p>no</p>";</script>ok""")
      === "ok")
    assert(strip("<style>p > span { color: red }</style>ok") === "ok")
    // comments, including multi-line
    assert(strip("a<!-- one\ntwo -->b") === "ab")
    // entities; &amp; decodes LAST so &amp;lt; is literal "&lt;"
    assert(strip(
      "Fish &amp; chips &lt;tag&gt; &quot;q&quot; &apos;a&apos; &#39;b&#39;")
      === "Fish & chips <tag> \"q\" 'a' 'b'")
    assert(strip("&amp;lt;") === "&lt;")
    // &nbsp; becomes plain space and collapses
    assert(strip("a&nbsp;&nbsp;b") === "a b")
    // block tags break lines; empty lines drop
    assert(strip("<h1>T</h1><p>one</p><p>two</p>") === "T\none\ntwo")
    assert(strip("<section><UL><li>i1</li><li>i2</li></UL></section>")
      === "i1\ni2")
    assert(strip("x<br/>y") === "x\ny")
    // doctype and unknown tags strip; inline tags do not break lines
    assert(strip("<!DOCTYPE html><custom-tag attr>z</custom-tag>") === "z")
    assert(strip("a <em>b</em> c") === "a b c")
  }

  test("htmlLines + extractText: link density, length, and stopword " +
    "density classify boilerplate; kept lines re-join in order") {
    val html =
      "<html><head><title>t</title>" +
        "<script>var x = \"<p>not text</p>\";</script></head>" +
        "<body><div class=\"nav\"><a href=\"/\">Home</a> " +
        "<a href=\"/a\">About</a> <a href=\"/c\">Contact</a></div>" +
        "<h1>The title of it</h1>" +
        "<p>The quick brown fox jumps over the lazy dog and it is a " +
        "fine day for running in the sun.</p>" +
        "<p>shrt</p>" +
        "<p>zzz qqq xxx vvv kkk mmm nnn ppp rrr sss ttt www yyy</p>" +
        "<footer><a href=\"#\">Back to top</a></footer></body></html>"
    val df = Seq((7L, html)).toDF("id", "h")

    val rows = TextPrep.htmlLines(df, "id", "h").orderBy("line_no")
      .collect()
    val flag = rows.map(r =>
      r.getAs[String]("line") -> r.getAs[Boolean]("is_boilerplate")).toMap
    // nav: visible text is almost all anchor content -> link-dense
    assert(flag("Home About Contact"))
    val nav = rows.find(_.getAs[String]("line") == "Home About Contact").get
    assert(nav.getAs[Long]("link_chars") === 16L) // Home+About+Contact
    assert(nav.getAs[Double]("link_density") > 0.35)
    // headline and prose survive
    assert(!flag("The title of it"))
    assert(!flag(rows.map(_.getAs[String]("line"))
      .find(_.startsWith("The quick brown fox")).get))
    // too short / no function words / footer chrome are boilerplate
    assert(flag("shrt"))
    assert(flag("zzz qqq xxx vvv kkk mmm nnn ppp rrr sss ttt www yyy"))
    assert(flag("Back to top"))
    // line_no renumbers the VISIBLE lines 1..n with no gaps
    assert(rows.map(_.getAs[Long]("line_no")).toSeq ===
      (1L to rows.length).toSeq)

    val got = TextPrep.extractText(df, "id", "h").collect().head
    assert(got.getAs[Long]("n_lines_kept") === 2L)
    assert(got.getAs[String]("text") ===
      "The title of it\nThe quick brown fox jumps over the lazy dog " +
        "and it is a fine day for running in the sun.")

    // a document that is ALL chrome yields no extract row
    val none = TextPrep.extractText(
      Seq((1L, "<p><a href='/'>x</a></p>")).toDF("id", "h"), "id", "h")
    assert(none.count() === 0L)
  }
}

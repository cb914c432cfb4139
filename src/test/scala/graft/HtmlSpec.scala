package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.Html

/** HTML main-content extraction (r14 verdict task #2) against
  * hand-built pages: chrome stripping, block splitting, the
  * integer-exact link-density rule, entity decode order, whitespace
  * collapse, and tag-soup degradation.
  */
class HtmlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def extract(html: String): (String, Seq[String], String) = {
    import spark.implicits._
    val row = Seq(html).toDF("html")
      .select(
        Html.pageTitle(col("html")).as("title"),
        filter(Html.blocks(col("html")), b => Html.keepBlock(b)).as("kept"),
        Html.mainText(col("html")).as("main"))
      .head()
    (row.getString(0), row.getSeq[String](1), row.getString(2))
  }

  test("a hand-built page: chrome out, content in, boilerplate dropped") {
    val page =
      """<html><head><title> My Article </title>
        |<style>body { color: red } p::before { content: "<p>" }</style>
        |<script>if (a < b) { document.write("<p>not content</p>"); }</script>
        |</head><body>
        |<nav><a href="/">Home</a><a href="/all">All articles</a></nav>
        |<header><p>Site name banner</p></header>
        |<!-- build 1234 -->
        |<p>The first real paragraph of the article body text.</p>
        |<p>A second paragraph with <a href="/ref">one small link</a> inside
        |a longer run of words.</p>
        |<p class="share"><a href="/tw">share</a> <a href="/fb">like</a></p>
        |<aside><p>Related: ten links nobody wants</p></aside>
        |<footer><a href="/imprint">Imprint</a></footer>
        |</body></html>""".stripMargin
    val (title, kept, main) = extract(page)
    assert(title === "My Article")
    assert(kept.length === 2, s"kept: $kept")
    assert(main ===
      "The first real paragraph of the article body text. " +
        "A second paragraph with one small link inside a longer run of words.")
    // the header's banner <p> died with the header, the share block
    // died of link density, the aside's <p> died with the aside, and
    // neither script-embedded "<p>" nor the style's "<p>" leaked in
    assert(!main.contains("banner") && !main.contains("share") &&
      !main.contains("Related") && !main.contains("not content"))
  }

  test("link density is integer-exact at the boundary") {
    // anchor 4 chars, text 9 chars: 8 < 9 → keep
    assert(extract("<body><p>x234 <a href=\"/\">b234</a></p></body>")
      ._2.length === 1)
    // anchor 4 chars, text 8 chars: 8 < 8 false → drop
    assert(extract("<body><p>x23 <a href=\"/\">b234</a></p></body>")
      ._2.isEmpty)
  }

  test("entity decode: &amp; last, so double-escapes survive one level") {
    val (_, _, main) = extract(
      "<p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;" +
        "and literal &amp;lt; stays</p>")
    assert(main === "A & B <tag> \"q\" 's' and literal &lt; stays")
  }

  test("whitespace collapses once, across block joins") {
    val (_, _, main) = extract(
      "<p>alpha\n\n   beta</p>\n\n<p>\tgamma  delta </p>")
    assert(main === "alpha beta gamma delta")
  }

  test("tag soup degrades without throwing: unclosed <p> yields no block") {
    val (_, kept, main) = extract("<body><p>never closed<div>x</div></body>")
    assert(kept.isEmpty && main === "")
  }

  test("synthPage drops its anchored blocks and keeps the entity close") {
    import spark.implicits._
    val row = Seq((14L, "alpha beta gamma delta epsilon zeta eta " +
      "theta iota kappa lambda mu nu xi")).toDF("doc_id", "text")
      .select(Html.synthPage(col("doc_id"), lit("en"),
        split(col("text"), "\\s+")).as("html"))
      .select(
        Html.mainText(col("html")).as("main"),
        size(Html.blocks(col("html"))).as("n_blocks"))
      .head()
    val main = row.getString(0)
    // doc 14: paragraph i=0 has (14+0)%4=2 → plain (kept), i=1 has
    // %4=3 → plain (kept); the entity close decodes; nav/footer gone
    assert(row.getInt(1) === 3) // 2 body blocks + entity block
    assert(main.startsWith("alpha beta gamma delta"))
    assert(main.endsWith("Q&A <ok> \"cited\" 'quoted' end of document"))
    assert(!main.contains("Home") && !main.contains("Privacy"))
  }
}

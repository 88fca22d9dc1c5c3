package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Extract

class ExtractSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def blocksOf(html: String): Seq[(String, Long, Long)] =
    Extract.htmlBlocks(Seq((1L, html)).toDF("doc_id", "html"),
        "doc_id", "html")
      .orderBy("block_idx")
      .collect()
      .map(r => (r.getString(2), r.getLong(3), r.getLong(4))).toSeq

  test("htmlBlocks: basic segmentation, whitespace collapse, link counting") {
    val html = "<html><head><title>My  Page</title></head><body>" +
      "<nav><a href='/x'>home</a> <a href='/y'>about</a></nav>" +
      "<div>real   article\n\ttext here</div>" +
      "<footer><a>terms</a> (c) 2026</footer></body></html>"
    blocksOf(html) shouldBe Seq(
      ("My Page", 6L, 0L),
      ("home about", 9L, 9L), // all non-ws chars inside <a>
      ("real article text here", 19L, 0L),
      ("terms (c) 2026", 12L, 5L))
  }

  test("script/style raw content dropped, fake tags and quotes inert inside") {
    val html = "<p>before</p><script>if (x < 2 && y > \"<div>junk</div>\")" +
      " { a = '</p>'; }</script><style>p>span { color: red }</style>" +
      "<p>after</p>"
    blocksOf(html) shouldBe Seq(("before", 6L, 0L), ("after", 5L, 0L))
  }

  test("comments drop their content including fake block tags; " +
      "unterminated comment drops the rest") {
    blocksOf("<p>a</p><!-- <p>ghost</p> --><p>b</p>") shouldBe
      Seq(("a", 1L, 0L), ("b", 1L, 0L))
    blocksOf("<p>a</p><!-- never closed <p>x</p>") shouldBe
      Seq(("a", 1L, 0L))
  }

  test("CDATA content is verbatim text (no entity decode, tags inert); " +
      "unterminated CDATA emits to end") {
    blocksOf("<p>x <![CDATA[raw < & &amp; <p>y]]> z</p>") shouldBe
      Seq(("x raw < & &amp; <p>y z", 16L, 0L))
    blocksOf("<p>a <![CDATA[tail") shouldBe Seq(("a tail", 5L, 0L))
  }

  test("entities: named table, decimal, hex, invalid stays literal") {
    blocksOf("<p>&amp; &lt;tag&gt; &quot;q&quot; &apos;s&apos; " +
      "a&nbsp;b &#65;&#x42;&#X43; &copy; &amp &#; &#xZZ; &#999999999; &</p>") shouldBe
      Seq(("& <tag> \"q\" 's' a b ABC &copy; &amp &#; &#xZZ; &#999999999; &",
        // & <tag>(5) "q"(3) 's'(3) ab ABC &copy;(6) &amp(4) &#;(3) &#xZZ;(6) &#999999999;(12) &
        1L + 5L + 3L + 3L + 2L + 3L + 6L + 4L + 3L + 6L + 12L + 1L, 0L))
  }

  test("literal '<' when not opening a tag; unterminated tag drops the rest") {
    blocksOf("<p>1 < 2 and x <3 ok</p>") shouldBe
      Seq(("1 < 2 and x <3 ok", 11L, 0L))
    blocksOf("<p>seen</p><div class=\"never closed") shouldBe
      Seq(("seen", 4L, 0L))
  }

  test("'>' inside quoted attribute values does not close the tag; " +
      "self-closing <br/> still splits blocks; uppercase tags match") {
    blocksOf("<DIV DATA-X=\"a>b\">one</DIV><P>two<BR/>three</P>") shouldBe
      Seq(("one", 3L, 0L), ("two", 3L, 0L), ("three", 5L, 0L))
  }

  test("nested and stray <a>: depth counted, clamps at zero; " +
      "self-closing <a/> opens nothing") {
    blocksOf("<p><a>out<a>in</a>still</a>free</a>post <a/>none</p>") shouldBe
      Seq(("outinstillfreepost none", 22L, 10L))
  }

  test("doctype and processing instructions skipped") {
    blocksOf("<!DOCTYPE html><?xml version=\"1.0\"?><p>body</p>") shouldBe
      Seq(("body", 4L, 0L))
  }

  test("empty / whitespace-only / text-free markup yields no blocks; " +
      "null html yields no rows") {
    blocksOf("") shouldBe Seq.empty
    blocksOf("<html><head></head><body>  \n </body></html>") shouldBe Seq.empty
    Extract.htmlBlocks(
        Seq((1L, Option.empty[String])).toDF("doc_id", "html"),
        "doc_id", "html")
      .count() shouldBe 0L
  }

  private val sitePage: Long => String = id =>
    s"<html><body><nav><a>home</a> <a>about</a></nav>" +
      s"<div>unique article body for document $id with plenty of text</div>" +
      "<p>shared disclaimer paragraph repeated on every page verbatim</p>" +
      "<footer><a>terms</a> <a>privacy</a> fine print</footer></body></html>"

  private def site = (1L to 12L).map(i => (i, sitePage(i))).toDF("doc_id", "html")

  test("blockReport + mainContent: density rules drop nav/footer, keep " +
      "article AND the (locally invisible) shared disclaimer") {
    val rep = Extract.blockReport(site, "doc_id", "html",
      minChars = 10, maxLinkDensityMicros = 300000L)
    val r1 = rep.filter(col("doc_id") === 1L).orderBy("block_idx").collect()
    r1.map(_.getAs[Boolean]("kept")).toSeq shouldBe
      Seq(false, true, true, false) // nav, article, disclaimer, footer
    // nav: all link chars -> density exactly 1e6
    r1(0).getAs[Long]("link_density_micros") shouldBe 1000000L
    val mc = Extract.mainContent(site, "doc_id", "html",
        minChars = 10, maxLinkDensityMicros = 300000L)
      .filter(col("doc_id") === 3L).head()
    mc.getAs[Long]("n_blocks") shouldBe 4L
    mc.getAs[Long]("n_kept") shouldBe 2L
    mc.getAs[String]("main_text") shouldBe
      "unique article body for document 3 with plenty of text\n" +
        "shared disclaimer paragraph repeated on every page verbatim"
  }

  test("boilerplateBlocks + mainContentDf: cross-doc frequency catches the " +
      "disclaimer the density rules kept; unique article survives both") {
    val boiler = Extract.boilerplateBlocks(site, "doc_id", "html", minDocs = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    boiler.keySet shouldBe Set(
      "home about",
      "shared disclaimer paragraph repeated on every page verbatim",
      "terms privacy fine print")
    boiler.values.toSet shouldBe Set(12L)
    val out = Extract.mainContentDf(site, "doc_id", "html",
        minChars = 10, maxLinkDensityMicros = 300000L, minDocs = 10L)
      .filter(col("doc_id") === 7L).head()
    out.getAs[Long]("n_blocks") shouldBe 4L
    out.getAs[Long]("n_kept") shouldBe 1L
    out.getAs[String]("main_text") shouldBe
      "unique article body for document 7 with plenty of text"
  }

  private def linksOf(html: String): Seq[(Long, String)] =
    Extract.htmlLinks(Seq((1L, html)).toDF("doc_id", "html"),
        "doc_id", "html")
      .orderBy("link_idx")
      .collect().map(r => (r.getLong(1), r.getString(2))).toSeq

  test("htmlLinks: hrefs in document order; quoted values may hold '>', " +
      "whitespace, '/'; unquoted values end at whitespace/'>'; entities " +
      "decode in the value; first href per tag wins") {
    val html = "<a href=\"/one\">1</a><a class='x' href='/t wo>w'>2</a>" +
      "<A HREF=/three>3</A><a href=\"/q?a=1&amp;b=2\">4</a>" +
      "<a href=\"/first\" href=\"/second\">5</a>"
    linksOf(html) shouldBe Seq((0L, "/one"), (1L, "/t wo>w"),
      (2L, "/three"), (3L, "/q?a=1&b=2"), (4L, "/first"))
  }

  test("htmlLinks: links inside comments, CDATA, and script raw content " +
      "never count; self-closing <script/> has no raw content; <a> " +
      "without href and closing </a> contribute nothing") {
    val html = "<!-- <a href=\"/ghost\">x</a> -->" +
      "<![CDATA[<a href=\"/cd\">y</a>]]>" +
      "<script>var s = '<a href=\"/js\">z</a>';</script>" +
      "<script src=\"/app.js\"/><a href=\"/real\">ok</a>" +
      "<a name=\"anchor\">no href</a></a>"
    linksOf(html) shouldBe Seq((0L, "/real"))
  }

  test("htmlLinks: unterminated tag drops the rest; valueless href and " +
      "empty href are kept as empty only when a value exists") {
    linksOf("<a href=\"/ok\">x</a><a href=\"/never") shouldBe
      Seq((0L, "/ok"))
    // href with no '=' value contributes nothing; explicit empty does
    linksOf("<a href>x</a><a href=\"\">y</a>") shouldBe Seq((0L, ""))
  }

  test("htmlLinks: one row per <a href> across docs, none for docs " +
      "without links; null html yields no rows") {
    val docs = Seq(
      (1L, "<p><a href=\"/a\">a</a> and <a href=\"/b\">b</a></p>"),
      (2L, "<p>plain text only</p>"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "html")
    val out = Extract.htmlLinks(docs, "doc_id", "html")
      .orderBy("doc_id", "link_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    out shouldBe Seq((1L, 0L, "/a"), (1L, 1L, "/b"))
  }

  test("mainContent is ONE pure projection: no exchange anywhere in the " +
      "physical plan, and the parser expression appears exactly once " +
      "(the aggregate fold references the array, not the parse)") {
    // built over range, not a LocalRelation — ConvertToLocalRelation
    // would otherwise evaluate the whole projection at optimize time
    // and leave nothing to inspect
    val rangeSite = spark.range(1, 13).select(col("id").as("doc_id"),
      concat(lit("<html><body><nav><a>home</a> <a>about</a></nav>" +
          "<div>unique article body for document "),
        col("id").cast("string"),
        lit(" with plenty of text</div></body></html>")).as("html"))
    val df = Extract.mainContent(rangeSite, "doc_id", "html")
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    } shouldBe empty
    val parses = df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case h: graft.functions.HtmlBlocksExpr => h })
    }.flatten
    parses.size shouldBe 1
  }

  private def gateOne(robotsTxt: Option[String], url: String,
      agent: String): (String, Boolean) = {
    val urls = Seq((1L, url)).toDF("id", "url")
    val robots = robotsTxt
      .map(t => Seq(("ex.com", t)).toDF("domain", "robots_txt"))
      .getOrElse(Seq.empty[(String, String)].toDF("domain", "robots_txt"))
    val r = Extract.robotsGate(urls, "url", robots,
      "domain", "robots_txt", agent).head()
    (r.getAs[String]("target"), r.getAs[Boolean]("allowed"))
  }

  test("robotsGate: REP longest-match — longest prefix wins, ties go to " +
      "Allow, no match or no robots means allowed; target is path+query") {
    val txt = "User-agent: *\nDisallow: /private\nAllow: /private/pub\n" +
      "Disallow: /p\nAllow: /p\n"
    gateOne(Some(txt), "https://ex.com/private/x", "bot") shouldBe
      (("/private/x", false))
    gateOne(Some(txt), "https://ex.com/private/pub/y?q=1", "bot") shouldBe
      (("/private/pub/y?q=1", true)) // longest match /private/pub
    gateOne(Some(txt), "https://ex.com/p", "bot") shouldBe
      (("/p", true)) // equal-length tie -> Allow
    gateOne(Some(txt), "https://ex.com/open", "bot") shouldBe
      (("/open", true)) // no matching rule
    gateOne(None, "https://ex.com/anything", "bot") shouldBe
      (("/anything", true)) // no robots for the domain
    // bare host: target normalizes to "/", which none of the rule
    // prefixes start -> allowed
    gateOne(Some(txt), "https://ex.com", "bot") shouldBe (("/", true))
    // and under a deny-all it refuses
    gateOne(Some("User-agent: *\nDisallow: /\n"),
      "https://ex.com", "bot") shouldBe (("/", false))
  }

  test("robotsGate: agent-specific group REPLACES the * group; agent and " +
      "field names match case-insensitively; comments, CRLF, empty " +
      "Disallow, and unknown directives handled") {
    val txt = "# banner\r\nUser-AGENT: * # everyone\r\nDisallow: /\r\n" +
      "Crawl-delay: 10\r\n\r\nuser-agent: GraftBot\r\nDisallow: /a\r\n" +
      "Sitemap: https://ex.com/map.xml\r\n"
    gateOne(Some(txt), "https://ex.com/b", "graftbot") shouldBe
      (("/b", true)) // graftbot group only disallows /a
    gateOne(Some(txt), "https://ex.com/a/x", "GRAFTBOT") shouldBe
      (("/a/x", false))
    gateOne(Some(txt), "https://ex.com/b", "otherbot") shouldBe
      (("/b", false)) // falls back to the * deny-all
    // empty Disallow contributes no rule: open site
    gateOne(Some("User-agent: *\nDisallow:\n"),
      "https://ex.com/x", "bot") shouldBe (("/x", true))
    // multiple user-agent lines share one rule set
    val multi = "User-agent: a\nUser-agent: b\nDisallow: /\n"
    gateOne(Some(multi), "https://ex.com/x", "b") shouldBe (("/x", false))
  }

  test("mainContent: every input doc reports a row, text-free docs zeroed") {
    val docs = Seq((1L, "<p>kept body text here</p>"),
      (2L, "<p>   </p>"), (3L, "")).toDF("doc_id", "html")
    val out = Extract.mainContent(docs, "doc_id", "html", minChars = 5,
        maxLinkDensityMicros = 300000L)
      .orderBy("doc_id").collect()
    out.map(_.getLong(1)).toSeq shouldBe Seq(1L, 0L, 0L)
    out.map(_.getAs[String]("main_text")).toSeq shouldBe
      Seq("kept body text here", "", "")
  }
  test("htmlAnchors: hostile markup — inner tags stripped, script/comment " +
      "content excluded, entities decode, superseding <a> splits captures") {
    val html =
      """<a href="/x">foo <b>bar</b></a>
        |<a href="/y">one<a href="/z?a=1&amp;b=2">two &#65;</a>
        |<a href="/s">pre<script>ignored "</a>" text</script>post</a>
        |<a>no href closes nothing</a>
        |<a href="/open">runs to end of input""".stripMargin
    val out = graft.operators.Extract.htmlAnchors(
        Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    out shouldBe Seq(
      (0L, "/x", "foo bar"),
      (1L, "/y", "one"),
      (2L, "/z?a=1&b=2", "two A"),
      (3L, "/s", "prepost"),
      (4L, "/open", "runs to end of input"))
  }

  test("htmlAnchors link_idx aligns with htmlLinks index-for-index") {
    val html = "<a href=\"/a\">first</a><p>x</p><a name=n>skip</a>" +
      "<a href=\"/b\">second</a>"
    val df = Seq((7L, html)).toDF("doc_id", "html")
    val links = graft.operators.Extract.htmlLinks(df, "doc_id", "html")
      .collect().map(r => (r.getLong(1), r.getString(2))).toSeq
    val anchors = graft.operators.Extract.htmlAnchors(df, "doc_id", "html")
      .collect().map(r => (r.getLong(1), r.getString(2))).toSeq
    anchors shouldBe links
    anchors shouldBe Seq((0L, "/a"), (1L, "/b"))
  }

}

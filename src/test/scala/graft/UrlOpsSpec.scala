package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.UrlOps

/** Pins URL canonicalization (case, www, query, fragment, trailing
  * slash) and the per-domain dedup rollup arithmetic. */
class UrlOpsSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .collect().head.getString(0)

  test("canonicalizeUrl folds tracking variants to one form") {
    val expected = "https://site.example.com/a/b"
    canon("https://site.example.com/a/b") shouldBe expected
    canon("HTTPS://WWW.Site.Example.COM/a/b") shouldBe expected
    canon("https://site.example.com/a/b?utm=x&y=2") shouldBe expected
    canon("https://site.example.com/a/b#frag") shouldBe expected
    canon("https://site.example.com/a/b/") shouldBe expected
    canon("https://site.example.com/a/b/?q=1#f") shouldBe expected
  }

  test("path case is preserved; only scheme and host fold") {
    canon("HTTP://Host.COM/CaseSensitive/Path") shouldBe
      "http://host.com/CaseSensitive/Path"
  }

  test("registrableDomain folds eTLD+1 with the vendored suffix slice") {
    def reg(u: String): String =
      Seq(u).toDF("u").select(UrlOps.registrableDomain(col("u")).as("r"))
        .collect().head.getString(0)
    reg("https://news.bbc.co.uk/x") shouldBe "bbc.co.uk"
    reg("https://bbc.co.uk/x") shouldBe "bbc.co.uk"
    reg("https://a.b.example.com.au/x") shouldBe "example.com.au"
    reg("https://a.b.example.com/x") shouldBe "example.com"
    reg("https://example.com/x") shouldBe "example.com"
    reg("https://WWW.Example.DE/x") shouldBe "example.de"
    reg("https://localhost/x") shouldBe "localhost" // single label passes through
    UrlOps.publicSuffixes should contain ("co.uk")
    UrlOps.publicSuffixes.size should be >= 100
  }

  test("urlDedupRollup: per-domain URL counts, doc counts, removed rows") {
    val rows = Seq(
      (1L, "https://a.com/x"),
      (2L, "https://WWW.A.com/x?utm=1"), // same canonical as 1
      (3L, "https://a.com/y"),
      (4L, "https://b.com/z"),
      (5L, "https://b.com/z#f")          // same canonical as 4
    ).toDF("id", "url")
    val out = UrlOps.urlDedupRollup(rows, "url", "id")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_urls"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_removed")))
      .toMap
    out("a.com") shouldBe ((2L, 3L, 1L))
    out("b.com") shouldBe ((1L, 2L, 1L))
  }
}

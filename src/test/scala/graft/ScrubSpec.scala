package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Scrub

/** Pins the PII scrubber: per-category counts, sequential redaction
  * order, and that clean text passes through untouched. */
class ScrubSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("scrubPii counts and redacts every category") {
    val text = "mail a.b@x.io or c-d@y.co.uk, ssn 123-45-6789, " +
      "call 415-555-0123, host 10.0.0.1, card 4111111111111111, " +
      "token deadbeefdeadbeefdeadbeefdeadbeef, key sk-abcdefgh12345678z end"
    val out = Scrub.scrubPii(Seq((1L, text)).toDF("id", "text"), "text")
      .collect().head
    out.getAs[Long]("n_email") shouldBe 2L
    out.getAs[Long]("n_ssn") shouldBe 1L
    out.getAs[Long]("n_ipv4") shouldBe 1L
    out.getAs[Long]("n_card") shouldBe 1L
    out.getAs[Long]("n_hexkey") shouldBe 1L
    out.getAs[Long]("n_apikey") shouldBe 1L
    val scrubbed = out.getAs[String]("scrubbed")
    scrubbed should include("<EMAIL>")
    scrubbed should include("<SSN>")
    scrubbed should include("<PHONE>")
    scrubbed should include("<IP>")
    scrubbed should include("<CARD>")
    scrubbed should include("<KEY>")
    scrubbed should not include "a.b@x.io"
    scrubbed should not include "123-45-6789"
    scrubbed should not include "4111111111111111"
  }

  test("clean text is untouched and counts are zero") {
    val out = Scrub.scrubPii(
        Seq((1L, "plain words only here")).toDF("id", "text"), "text")
      .collect().head
    Scrub.piiPatterns.foreach { case (cat, _, _) =>
      withClue(cat) { out.getAs[Long](s"n_$cat") shouldBe 0L }
    }
    out.getAs[String]("scrubbed") shouldBe "plain words only here"
  }

  test("redaction is sequential in pattern order: SSN wins over phone") {
    // 123-45-6789 matches the SSN shape; the phone pattern must see
    // the placeholder, not double-redact
    val out = Scrub.scrubPii(Seq((1L, "id 123-45-6789 x")).toDF("id", "text"), "text")
      .collect().head
    out.getAs[String]("scrubbed") shouldBe "id <SSN> x"
    out.getAs[Long]("n_ssn") shouldBe 1L
  }

  test("adversarial completeness: no pattern matches its own scrub output") {
    // randomized PII-ish soup (seeded): after scrubbing, NO pattern
    // may still match — placeholders must not recombine with
    // surrounding text into fresh matches
    val rnd = new scala.util.Random(99)
    val frags = Seq(
      "bob@x.io", "999-99-9999", "650-555-0000", "8.8.8.8",
      "4242424242424242", "abcdefabcdefabcdefabcdefabcdef12",
      "sk-Zz9Yy8Xx7Ww6Vv5Uu4", "plain", "words", "-", ".", "@", "12",
      "a1b2", "end.")
    val texts = (0 until 40).map { i =>
      (i.toLong, Seq.fill(12)(frags(rnd.nextInt(frags.length))).mkString(" "))
    }
    val compiled = Scrub.piiPatterns.map { case (c, p, _) =>
      c -> java.util.regex.Pattern.compile(p)
    }
    Scrub.scrubPii(texts.toDF("id", "text"), "text")
      .select("scrubbed").collect().map(_.getString(0)).foreach { s =>
      compiled.foreach { case (cat, pat) =>
        withClue(s"$cat still matches in: $s") {
          pat.matcher(s).find() shouldBe false
        }
      }
    }
  }

  test("foldConfusables: strips zero-width chars, folds Cyrillic homoglyphs, idempotent") {
    val df = Seq(
      (1L, "cl\u200bick he\u200cre"),              // ZWSP + ZWNJ inside words
      (2L, "\u0441lick h\u0435r\u0435"),          // Cyrillic s/e lookalikes
      (3L, "\u0421LICK \u0425ERE"),                // upper-case Cyrillic
      (4L, "plain ascii stays"),
      (5L, "\ufeffbom\u200dgone")).toDF("id", "t")
    val out = df.select(col("id"), Scrub.foldConfusables(col("t")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe "click here"
    out(2L) shouldBe "click here"
    out(3L) shouldBe "CLICK XERE" // Cyrillic Es -> X: codepoint map, not language
    out(4L) shouldBe "plain ascii stays"
    out(5L) shouldBe "bomgone"
    // idempotent: folding folded text is a no-op
    val twice = df.select(
        Scrub.foldConfusables(Scrub.foldConfusables(col("t"))).as("f"))
      .collect().map(_.getString(0)).toSet
    twice shouldBe out.values.toSet
  }
}

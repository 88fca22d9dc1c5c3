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
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import graft.functions.NfcNormalizeExpr

class NfcNormalizeSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def nfc(c: org.apache.spark.sql.Column) =
    toColumn(NfcNormalizeExpr(toExpression(c)))

  test("composes combining marks to the precomposed forms") {
    // e+COMBINING ACUTE, n+COMBINING TILDE, u+COMBINING DIAERESIS
    val df = Seq("café mañana zürich").toDF("s")
    val len = org.apache.spark.sql.functions.length _
    val out = df.select(nfc(col("s")).as("n"),
      len(col("s")).as("lb"), len(nfc(col("s"))).as("la"))
      .head()
    out.getString(0) shouldBe "café mañana zürich"
    out.getInt(1) shouldBe out.getInt(2) + 3 // three marks composed away
  }

  test("singleton decomposition: ANGSTROM SIGN normalizes to A-with-ring") {
    val out = Seq("Å").toDF("s").select(nfc(col("s"))).head.getString(0)
    out shouldBe "Å"
  }

  test("already-NFC text passes through unchanged, including plain ASCII") {
    val rows = Seq("plain ascii", "café", "", "tab\tnl\n")
    val got = rows.toDF("s").select(nfc(col("s"))).collect().map(_.getString(0))
    got.toSeq shouldBe rows
  }

  test("null propagates and the expression is idempotent") {
    val df = Seq(Some("café"), None).toDF("s")
    val got = df.select(nfc(nfc(col("s")))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    got.toSeq shouldBe Seq("café", null)
  }
}

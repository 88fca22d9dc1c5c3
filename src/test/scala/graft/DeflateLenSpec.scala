package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.scalatest.matchers.should.Matchers

import graft.functions.DeflateLenExpr

class DeflateLenSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def dlen(c: org.apache.spark.sql.Column) =
    toColumn(DeflateLenExpr(toExpression(c)))

  test("repetitive text compresses far below its raw size; high-entropy " +
      "text barely compresses — the two junk tails the signal separates") {
    val rnd = new scala.util.Random(17)
    val noise = (1 to 1000).map(_ => rnd.nextPrintableChar()).mkString
    val rows = Seq(
      ("rep", "spam " * 200),
      ("noise", noise)).toDF("k", "text")
      .select($"k", expr("octet_length(text)").as("raw"), dlen($"text").as("c"))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val (rawRep, cRep) = rows("rep")
    val (rawNoise, cNoise) = rows("noise")
    cRep.toDouble / rawRep should be < 0.05   // 1000 bytes of "spam " -> tiny
    cNoise.toDouble / rawNoise should be > 0.7 // printable noise stays big
  }

  test("deterministic, bounded, and null-safe") {
    val df = Seq(Tuple1("hello world, hello world, hello world"))
      .toDF("text")
    val a = df.select(dlen($"text")).head().getInt(0)
    val b = df.select(dlen($"text")).head().getInt(0)
    a shouldBe b
    a should be >= 11 // zlib header + adler floor
    a should be <= 37 + 64
    Seq(Tuple1(null: String)).toDF("text")
      .select(dlen($"text")).head().isNullAt(0) shouldBe true
    // empty string still yields the zlib envelope, not zero
    Seq(Tuple1("")).toDF("text").select(dlen($"text")).head().getInt(0) should be >= 8
  }

  test("a 4x self-repeat compresses to well under twice the single copy " +
      "(the backreference property q135 certifies)") {
    val text = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val r = Seq(Tuple1(text)).toDF("text")
      .select(dlen($"text").as("c"),
        dlen(concat($"text", $"text", $"text", $"text")).as("c4"))
      .head()
    r.getInt(1) should be < (r.getInt(0) * 2 + 32)
  }
}

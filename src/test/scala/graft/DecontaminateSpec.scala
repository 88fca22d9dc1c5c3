package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Decontaminate

class DecontaminateSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private lazy val eval = Seq(
    (100L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  private lazy val train = Seq(
    (1L, "a quick brown fox ran away"),            // shares "quick brown fox"
    (2L, "the quick brown fox jumps here today"),  // shares 3 grams
    (3L, "completely unrelated text with no overlap at all"),
    (4L, "the quick brown fox jumps over the lazy dog"), // verbatim leak
    (5L, "fox")                                     // short doc: whole text is the gram
  ).toDF("doc_id", "text")

  private def report(minOverlap: Int = 2) =
    Decontaminate.contaminationReport(train, eval, "doc_id", "text",
        n = 3, minOverlap = minOverlap)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("counts distinct leaked n-grams per train doc and thresholds them") {
    val m = report()
    m(1L) shouldBe ((4L, 1L, false))  // only "quick brown fox"
    m(2L)._2 shouldBe 3L              // "the quick brown","quick brown fox","brown fox jumps"
    m(2L)._3 shouldBe true
    m(3L) shouldBe ((6L, 0L, false))
    m(4L) shouldBe ((7L, 7L, true))   // every gram of a verbatim copy leaks
    m(5L) shouldBe ((1L, 0L, false))  // "fox" is not a 3-gram of the eval doc
    m.size shouldBe 5                 // clean docs still get a row
  }

  test("repeating one leaked phrase stays one hit (distinct grams)") {
    val spammy = Seq((9L, Array.fill(20)("quick brown fox").mkString(" ")))
      .toDF("doc_id", "text")
    val m = Decontaminate.contaminationReport(spammy, eval, "doc_id", "text", 3, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // windows across the repeats produce only 3 distinct grams, all leaked
    m(9L) should be <= 3L
    m(9L) should be >= 1L
  }

  test("is partition-invariant") {
    val a = report()
    val b = Decontaminate.contaminationReport(
        train.repartition(7), eval.repartition(3), "doc_id", "text", 3, 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    b shouldBe a
  }
}

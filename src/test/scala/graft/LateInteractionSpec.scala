package graft

import org.scalatest.matchers.should.Matchers

import graft.operators.LateInteraction

/** Pins MaxSim structure: exact token matches contribute exactly 1e6,
  * the token cap truncates in first-occurrence order, and docs
  * sharing no grams never become candidates. */
class LateInteractionSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("maxSimTopK: exact token matches score 1e6 each; coverage orders docs") {
    val queries = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "alpha beta filler"),   // both query tokens present -> 2e6
      (20L, "alpha wxyz"),          // one exact match + weak partner
      (30L, "alpha beta")).         // identical token set -> 2e6
      toDF("doc_id", "text")
    val out = LateInteraction.maxSimTopK(queries, corpus,
        "doc_id", "doc_id", "text", maxTokens = 8, dim = 64, k = 3)
      .collect().map(r => r.getAs[Long]("c_id") ->
        (r.getAs[Long]("rank"), r.getAs[Long]("score_micros"))).toMap
    out(10L)._2 shouldBe 2000000L
    out(30L)._2 shouldBe 2000000L
    // 2e6 ties break to the lower c_id
    out(10L)._1 shouldBe 1L
    out(30L)._1 shouldBe 2L
    out(20L)._1 shouldBe 3L
    out(20L)._2 should be < 2000000L
    out(20L)._2 should be >= 1000000L // the exact "alpha" match alone
  }

  test("maxSimTopK: token cap keeps the first maxTokens distinct tokens") {
    // identical docs, 4 distinct tokens, cap 2 -> self-score 2e6
    val d = Seq((1L, "aaa bbb ccc ddd")).toDF("doc_id", "text")
    val out = LateInteraction.maxSimTopK(d, d, "doc_id", "doc_id",
        "text", maxTokens = 2, dim = 64, k = 1)
      .head()
    out.getAs[Long]("score_micros") shouldBe 2000000L
  }

  test("maxSimTopK: disjoint gram docs are not candidates") {
    val queries = Seq((1L, "aaaa")).toDF("doc_id", "text")
    // no shared char trigram and (checked by construction at dim=64)
    // no bucket collision with "aaaa"'s grams
    val corpus = Seq((10L, "zzzz")).toDF("doc_id", "text")
    LateInteraction.maxSimTopK(queries, corpus, "doc_id", "doc_id",
        "text", maxTokens = 8, dim = 64, k = 3)
      .count() shouldBe 0L
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Blocklist

class BlocklistSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("acCounts: hand-checked non-overlapping counts, incl. self-overlap runs") {
    val pats = Seq("aba", "aa", "ab", "ba", "zz")
    val out = Seq((1L, "ababa"), (2L, "aaaa"), (3L, "plain"))
      .toDF("id", "t")
      .select($"id", Blocklist.acCounts($"t", pats).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // "ababa": aba at 0 (next allowed 3 → the one at 2 skipped), ab ×2, ba ×2
    out(1L) shouldBe Seq(1, 0, 2, 2, 0)
    // "aaaa": aa at 0 and 2 — non-overlapping, exactly replace's 2
    out(2L) shouldBe Seq(0, 2, 0, 0, 0)
    out(3L) shouldBe Seq(0, 0, 0, 0, 0)
  }

  test("acCounts equals the replace arithmetic for every (text, pattern)") {
    val pats = Seq("slow", "fast table", "a a", "er", "xx")
    val docs = Seq(
      (1L, "slow fast table slow slower a a a xx xxxx"),
      (2L, "merger tavern er er"),
      (3L, ""),
      (4L, "fast tablefast table a a")).toDF("id", "t")
    val ac = Blocklist.acCounts($"t", pats)
    val F = org.apache.spark.sql.functions
    val viaReplace = array(pats.map(p =>
      ((F.length($"t") - F.length(regexp_replace($"t", java.util.regex.Pattern.quote(p), ""))) /
        lit(p.length)).cast("int")): _*)
    docs.select(ac.as("a"), viaReplace.as("b"))
      .collect().foreach { r =>
        r.getSeq[Int](0) shouldBe r.getSeq[Int](1)
      }
  }

  test("hitCounts emits long-form rows only for hits > 0; null text drops out") {
    val docs = Seq((1L, "Buy NOW buy now"), (2L, "clean"), (3L, null))
      .toDF("id", "t")
    val rows = Blocklist.hitCounts(docs, "id", "t", Seq("buy now", "clean"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    rows.toSet shouldBe Set((1L, "buy now", 2L), (2L, "clean", 1L))
  }

  test("screen: totals, distinct-pattern count, keep flag; shuffle-free plan") {
    val docs = Seq((1L, "spam spam ham"), (2L, "ham only")).toDF("id", "t")
    val out = Blocklist.screen(docs, "id", "t", Seq("spam", "eggs"), maxHits = 2)
    val m = out.collect().map(r => r.getLong(0) ->
      (r.getAs[Long]("total_hits"), r.getAs[Long]("n_patterns_hit"),
        r.getAs[Boolean]("blocklist_keep"))).toMap
    m(1L) shouldBe ((2L, 1L, false))
    m(2L) shouldBe ((0L, 0L, true))
    val plan = out.queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
  test("categorize: per-category sums, argmax topic, none, lexicographic ties") {
    val cats = Seq("b_cat" -> Seq("beta"), "a_cat" -> Seq("alpha"),
      "c_cat" -> Seq("gamma", "delta"))
    val docs = Seq(
      (1L, "alpha beta beta"),   // b_cat wins 2-1
      (2L, "ALPHA beta"),        // tie 1-1 -> a_cat (lexicographic)
      (3L, "gamma delta gamma"), // c_cat 3
      (4L, "nothing here")       // none
    ).toDF("id", "t")
    val out = graft.operators.Blocklist.categorize(docs, "id", "t", cats)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("hits_a_cat"), r.getAs[Long]("hits_b_cat"),
          r.getAs[Long]("hits_c_cat"), r.getAs[String]("topic")))).toMap
    out(1L) shouldBe ((1L, 2L, 0L, "b_cat"))
    out(2L) shouldBe ((1L, 1L, 0L, "a_cat"))
    out(3L) shouldBe ((0L, 0L, 3L, "c_cat"))
    out(4L) shouldBe ((0L, 0L, 0L, "none"))
  }

}

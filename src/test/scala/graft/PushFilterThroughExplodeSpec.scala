package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.dataFrameOf
import org.scalatest.matchers.should.Matchers

import graft.plans.PushFilterThroughExplode

class PushFilterThroughExplodeSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, Seq("a", "b", "a", "c")),      // duplicates must KEEP multiplicity
    (2L, Seq("x", "y")),                // no survivors
    (3L, Seq("b")),
    (4L, Seq.empty[String]),            // empty array
    (5L, Seq("a", null, "b"))           // null element drops on both paths
  ).toDF("doc_id", "toks")

  private def applyRule(df: DataFrame): DataFrame =
    dataFrameOf(spark, PushFilterThroughExplode(df.queryExecution.analyzed))

  private def rows(df: DataFrame): Seq[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  test("rewrites IN-on-exploded-element into an element-level filter; results identical") {
    val q = docs.select($"doc_id", explode($"toks").as("t"))
      .filter($"t".isin("a", "b"))
    val rewritten = applyRule(q)
    rewritten.queryExecution.optimizedPlan.toString should include ("filter(")
    rows(rewritten) shouldBe rows(q)
    rows(rewritten) shouldBe Seq((1L, "a"), (1L, "a"), (1L, "b"), (3L, "b"), (5L, "a"), (5L, "b"))
  }

  test("mixed conjuncts: the membership pushes, the rest stays above") {
    val q = docs.select($"doc_id", explode($"toks").as("t"))
      .filter($"t".isin("a", "b") && $"doc_id" < 4)
    val rewritten = applyRule(q)
    rows(rewritten) shouldBe rows(q)
    rows(rewritten) shouldBe Seq((1L, "a"), (1L, "a"), (1L, "b"), (3L, "b"))
  }

  test("equality predicate pushes too") {
    val q = docs.select($"doc_id", explode($"toks").as("t"))
      .filter($"t" === "b")
    rows(applyRule(q)) shouldBe rows(q)
  }

  test("explode_outer is never rewritten (emptied arrays would gain a null row)") {
    val q = docs.select($"doc_id", explode_outer($"toks").as("t"))
      .filter($"t".isin("zzz"))
    val before = q.queryExecution.analyzed
    PushFilterThroughExplode(before) shouldBe before
    applyRule(q).count() shouldBe 0
  }

  test("non-literal membership is not touched") {
    val q = docs.select($"doc_id", explode($"toks").as("t"))
      .filter($"t" === concat(lit("a"), lit("")).substr(1, 1) || $"t".isin("b"))
    // disjunction -> single conjunct that is not a bare IN/= -> untouched
    val before = q.queryExecution.analyzed
    PushFilterThroughExplode(before) shouldBe before
  }

  test("the session-extension hook injects the rule without throwing") {
    noException should be thrownBy new graft.functions.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("rule is idempotent (a rewritten plan does not match again)") {
    val q = docs.select($"doc_id", explode($"toks").as("t"))
      .filter($"t".isin("a", "b"))
    val once = PushFilterThroughExplode(q.queryExecution.analyzed)
    PushFilterThroughExplode(once) shouldBe once
  }
}

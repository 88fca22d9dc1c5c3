package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Matcher

/** Pins the flagship-query semantics of `main.py:67-166`:
  * deterministic top-k tie-break (argsort stability → lowest reference
  * row wins), rank pivot column layout, and the exact-match overwrite
  * incl. its definition-vs-all_text asymmetry and rank-2..k nulling. */
class MatcherSpec extends SparkSpec with Matchers {
  import spark.implicits._

  // reference table: 3 rows with frozen 2-d vectors
  private lazy val ref = Matcher.prepareReference(
    Seq(
      ("CL:1", "alveolar cell", "AT1", "def one", "alveolar cell AT1 def one", Seq(1.0, 0.0)),
      ("CL:2", "basal cell", "BC", "def two", "basal cell BC def two", Seq(0.0, 1.0)),
      ("CL:3", "duplicate name", "D1", "def three", "dup text three", Seq(1.0, 0.0)))
      .toDF("CT_ID", "CT_NAME", "CT_LABEL", "definition", "all_text", "embedding"),
    "embedding", Seq("CT_ID"))

  private def queries(rows: (String, String, Seq[Double])*) =
    rows.toSeq.toDF("source", "raw_input_label", "qvec")
      .withColumn("cleaned_input_label",
        graft.functions.GraftUdfs.cleanLabel(col("raw_input_label")))

  test("top-k ranks by cosine desc; ties break to the lower ref_row_id") {
    // qvec (1,0) ties CL:1 and CL:3 at cosine 1.0 — CL:1 (lower row id) must win rank 1
    val out = Matcher.mapLabels(
      queries(("test", "tied query", Seq(1.0, 0.0))), ref, k = 2).head()
    out.getAs[String]("matched_asctb_id_1") shouldBe "CL:1"
    out.getAs[String]("matched_asctb_id_2") shouldBe "CL:3"
    out.getAs[Double]("match_score_1") shouldBe 1.0 +- 1e-12
  }

  test("k larger than the corpus: missing ranks are null, no ANSI crash") {
    // 3-row reference, k=5 — ranks 4..5 have no candidate; the rank
    // projection must read past the top-k array's end null-safely
    // (ANSI mode turns a plain element access into an error)
    val out = Matcher.mapLabels(
      queries(("t", "small corpus", Seq(1.0, 0.5))), ref, k = 5).head()
    out.getAs[String]("matched_asctb_id_3") should not be null
    out.isNullAt(out.fieldIndex("match_score_4")) shouldBe true
    out.isNullAt(out.fieldIndex("matched_asctb_id_4")) shouldBe true
    out.isNullAt(out.fieldIndex("matched_asctb_text_5")) shouldBe true
  }

  test("report has the reference's wide schema for k=2") {
    val out = Matcher.mapLabels(queries(("t", "x", Seq(1.0, 1.0))), ref, k = 2)
    out.columns.toSeq shouldBe Seq(
      "source", "raw_input_label", "cleaned_input_label",
      "match_score_1", "matched_asctb_id_1", "matched_asctb_label_1", "matched_asctb_text_1",
      "match_score_2", "matched_asctb_id_2", "matched_asctb_label_2", "matched_asctb_text_2")
  }

  test("fuzzy path writes all_text into matched_asctb_text_i (main.py:97)") {
    val out = Matcher.mapLabels(
      queries(("t", "no exact match here", Seq(0.0, 1.0))), ref, k = 1).head()
    out.getAs[String]("matched_asctb_id_1") shouldBe "CL:2"
    out.getAs[String]("matched_asctb_text_1") shouldBe "basal cell BC def two"
  }

  test("exact overwrite: score forced 1.0, definition (not all_text) in slot 1, ranks 2..k nulled") {
    // cleaned("Basal Cells") == cleaned("basal cell") == "basal cell"
    val out = Matcher.mapLabels(
      queries(("t", "Basal Cells", Seq(1.0, 0.0))), ref, k = 2).head()
    out.getAs[Double]("match_score_1") shouldBe 1.0
    out.getAs[String]("matched_asctb_id_1") shouldBe "CL:2"
    // the reference's quirk: exact path writes `definition` into the text slot (main.py:145 vs :97)
    out.getAs[String]("matched_asctb_text_1") shouldBe "def two"
    out.isNullAt(out.fieldIndex("match_score_2")) shouldBe true
    out.isNullAt(out.fieldIndex("matched_asctb_id_2")) shouldBe true
  }

  test("zero query vector scores 0 everywhere and still yields k rows (no ANSI crash)") {
    val out = Matcher.mapLabels(
      queries(("t", "zzz empty", Seq(0.0, 0.0))), ref, k = 2).head()
    out.getAs[Double]("match_score_1") shouldBe 0.0
    out.getAs[String]("matched_asctb_id_1") shouldBe "CL:1" // tie at 0 → lowest row id
  }

  test("prepareReference rejects a corpus-sized reference table") {
    val corpus = spark.range(0, 1000)
      .select(col("id").cast("string").as("CT_ID"), lit("n").as("CT_NAME"),
        lit("t").as("all_text"), lit("d").as("definition"),
        array(lit(1.0), lit(0.0)).as("embedding"))
    // the guard is folded into the row_number projection (no separate
    // guard job), so it fires on the first ACTION over the prepared ref
    val e = intercept[Exception] {
      Matcher.prepareReference(corpus, "embedding", Seq("CT_ID"), maxCatalogRows = 100)
        .collect()
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    messages should include("catalog-sized")
  }

  test("prepareReference under the limit passes and numbers rows in order") {
    ref.select("ref_row_id").as[Long].collect().sorted shouldBe Array(1L, 2L, 3L)
  }

  test("mapLabels plan shape: broadcast joins only, at most 3 shuffles, no sort-merge join") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val plan = Matcher.mapLabels(
        queries(("test", "probe", Seq(1.0, 0.0))), ref, k = 2)
      .queryExecution.executedPlan
    val all = plan.collectWithSubqueries { case p => p }
    // the design claim the operator's scaladoc makes: one query-side
    // shuffle (the upstream distinct's, reused by the top-k aggregate)
    // plus the catalog-sized reference's row_number sort — everything
    // else broadcasts. A SortMergeJoin or extra exchange appearing
    // here means a Spark upgrade or edit broke the physical shape.
    all.count(_.isInstanceOf[ShuffleExchangeExec]) should be <= 3
    all.count(_.isInstanceOf[SortMergeJoinExec]) shouldBe 0
  }

  test("first-row-wins on duplicate cleaned reference names (main.py:119)") {
    val dupRef = Matcher.prepareReference(
      Seq(
        ("CL:9", "same name", "L9", "def nine", "t9", Seq(1.0, 0.0)),
        ("CL:8", "Same  Name", "L8", "def eight", "t8", Seq(0.0, 1.0)))
        .toDF("CT_ID", "CT_NAME", "CT_LABEL", "definition", "all_text", "embedding"),
      "embedding", Seq("CT_ID"))
    // both clean to "same name"; ref_row_id ordered by CT_ID → CL:8 first
    val out = Matcher.mapLabels(
      queries(("t", "same name", Seq(1.0, 0.0))), dupRef, k = 1).head()
    out.getAs[String]("matched_asctb_id_1") shouldBe "CL:8"
    out.getAs[String]("matched_asctb_text_1") shouldBe "def eight"
  }
}

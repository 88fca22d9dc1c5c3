package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Matcher

/** Golden-file parity against the reference's checked-in artifact
  * `asctb_reference_embeddings/ASCTB_Lungv1_2.csv` (the output of its
  * embedding-build entry point for Lung v1.2, 83 rows × 768-d
  * vectors) — vendored into test resources per SURVEY.md §5.2.
  *
  * These tests pin our operator semantics against REAL reference
  * output rather than synthetic fixtures: the all_text construction
  * rule (null-propagating concat + CT_NAME fallback), the sentinel
  * conventions, and the matcher run on the frozen 768-d vectors.
  */
class GoldenReferenceSpec extends SparkSpec with Matchers {

  private lazy val golden: DataFrame = {
    val parseVec = udf((s: String) =>
      s.replaceAll("[\\[\\]]", " ").trim.split("\\s+").map(_.toDouble))
    spark.read
      .option("header", "true")
      .option("multiLine", "true") // numpy vector strings span lines
      .csv(getClass.getResource("/ASCTB_Lungv1_2.csv").toString)
      .withColumn("embedding", parseVec(col("embedding_results")))
      .cache()
  }

  test("golden table loads: 83 rows, 768-d vectors, expected schema") {
    golden.count() shouldBe 83L
    golden.columns should contain allOf
      ("CT_ID", "CT_NAME", "CT_LABEL", "definition", "all_text", "embedding_results")
    val dims = golden.select(
        org.apache.spark.sql.functions.size(col("embedding")).as("d"))
      .distinct().collect().map(_.getInt(0))
    dims.toSeq shouldBe Seq(768)
  }

  test("all_text follows the F12/F13 rule on every golden row: null-propagating concat, CT_NAME fallback") {
    val recomputed = golden.withColumn("expected_all_text",
      coalesce(
        concat(col("CT_NAME"), lit(" "), col("CT_LABEL"), lit(" "), col("definition")),
        col("CT_NAME")))
    recomputed.filter(col("expected_all_text") =!= col("all_text")).count() shouldBe 0L
    // the fallback branch is actually exercised (rows with null CT_LABEL)
    recomputed.filter(col("CT_LABEL").isNull).count() should be > 0L
  }

  test("sentinels appear exactly as the reference writes them") {
    // P4: missing CT_ID → 'ASCTB CT_ID UNK'
    golden.filter(col("CT_ID") === "ASCTB CT_ID UNK").count() shouldBe 11L
    // F15: missing OLS definition → literal string 'NaN'
    golden.filter(col("definition") === "NaN").count() shouldBe 21L
    // real CT_IDs stay colon-form in the persisted table (the F11
    // underscore transform is only the OLS lookup key, not stored):
    // 83 = 67 CL: ids + 5 LMHA: ids + 11 UNK sentinels
    golden.filter(col("CT_ID").rlike("^CL:")).count() shouldBe 67L
    golden.filter(col("CT_ID") =!= "ASCTB CT_ID UNK" &&
      col("CT_ID").contains("_")).count() shouldBe 0L
  }

  test("matcher on the frozen 768-d vectors: every row's top-1 match is itself with score 1") {
    val ref = Matcher.prepareReference(
      golden.select("CT_ID", "CT_NAME", "CT_LABEL", "definition", "all_text", "embedding"),
      "embedding", Seq("CT_ID", "CT_NAME"))
    val queries = golden
      .select(col("CT_NAME").as("raw_input_label"), col("embedding").as("qvec"),
        col("CT_ID").as("expect_id"))
      .withColumn("source", lit("golden"))
      .withColumn("cleaned_input_label",
        graft.functions.GraftUdfs.cleanLabel(col("raw_input_label")))
      .dropDuplicates("raw_input_label") // duplicate CT_NAMEs collapse (basal cell, tuft cell)
    val report = Matcher.mapLabels(
      queries.drop("expect_id"), ref, k = 1)
    report.count() shouldBe queries.count()
    // exact-name overwrite forces every score to exactly 1.0 (each
    // query label IS a reference CT_NAME)
    report.filter(col("match_score_1") =!= 1.0).count() shouldBe 0L
    // and the matched label round-trips through cleaning: cleaned
    // query == cleaned matched name
    val mismatch = report.filter(
      graft.functions.GraftUdfs.cleanLabel(col("matched_asctb_label_1")) =!=
        col("cleaned_input_label"))
    mismatch.count() shouldBe 0L
  }

  test("fuzzy path on frozen vectors: nearest neighbour of a perturbed vector is the original row") {
    import spark.implicits._
    // pick 3 rows with distinct names, nudge their vectors slightly
    val rows = golden.select("CT_ID", "CT_NAME", "embedding")
      .dropDuplicates("CT_NAME")
      .orderBy("CT_ID").limit(3).collect()
    val ref = Matcher.prepareReference(
      golden.select("CT_ID", "CT_NAME", "CT_LABEL", "definition", "all_text", "embedding"),
      "embedding", Seq("CT_ID", "CT_NAME"))
    val queries = rows.toSeq.map { r =>
      val vec = r.getSeq[Double](2).toArray
      vec(0) += 0.001 // tiny perturbation: cosine to the original stays highest
      (s"q_${r.getString(0)}", "perturbed nonexistent label xyz " + r.getString(1),
        vec.toSeq)
    }.toDF("expect", "raw_input_label", "qvec")
      .withColumn("source", lit("golden"))
      .withColumn("cleaned_input_label",
        graft.functions.GraftUdfs.cleanLabel(col("raw_input_label")))
    val report = Matcher.mapLabels(queries.drop("expect"), ref, k = 1)
      .withColumn("expect_id",
        expr("substring(split(raw_input_label, ' ')[4], 1, 100)")) // not used; sanity only
    // no exact-name match exists → fuzzy path; nearest must be the source row
    val got = report.select("raw_input_label", "matched_asctb_id_1", "match_score_1")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (id, score) = got("perturbed nonexistent label xyz " + r.getString(1))
      id shouldBe r.getString(0)
      score should be > 0.999
      score should be < 1.0
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Wrangle

/** Pins the sheet-wrangling semantics of
  * `asctb_data_wrangling.py:94-111` including the two reference
  * quirks (single-digit LABEL regex; lexicographic column sort) and
  * the sentinel/enrichment behaviour of `:188-215`. */
class WrangleSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("celltypeColumns: reference regex drops CT/10/LABEL and sorts lexicographically") {
    val df = Seq(("a")).toDF("x").select(
      lit("").as("CT/1"), lit("").as("CT/1/ID"), lit("").as("CT/1/LABEL"),
      lit("").as("CT/2"), lit("").as("CT/2/ID"), lit("").as("CT/2/LABEL"),
      lit("").as("CT/10"), lit("").as("CT/10/ID"), lit("").as("CT/10/LABEL"),
      lit("").as("AS/1")) // non-CT column ignored
    val ref = Wrangle.celltypeColumns(df)
    // CT/10/LABEL fails the single-digit LABEL regex → 8 columns
    ref should have length 8
    ref should not contain "CT/10/LABEL"
    // lexicographic: CT/10 sorts before CT/2
    ref.indexOf("CT/10") should be < ref.indexOf("CT/2")
    // fixed mode: numeric order, all 9 columns
    val fixed = Wrangle.celltypeColumns(df, fixed = true)
    fixed should have length 9
    fixed.take(3) shouldBe Seq("CT/1", "CT/1/ID", "CT/1/LABEL")
    fixed.indexOf("CT/2") should be < fixed.indexOf("CT/10")
  }

  test("wrangle: triplet unpivot + dropna(all) + dedup + CT_ID sentinel") {
    val wide = Seq(
      ("alveolar cell", "CL:1", "AT1", "basal cell", "CL:2", "BC"),
      ("alveolar cell", "CL:1", "AT1", null, null, null), // dup triplet + all-null triplet
      ("no id cell", null, "NL", "basal cell", "CL:2", "BC"))
      .toDF("CT/1", "CT/1/ID", "CT/1/LABEL", "CT/2", "CT/2/ID", "CT/2/LABEL")
    val out = Wrangle.wrangle(wide)
    out.columns.toSeq shouldBe Seq("CT_ID", "CT_NAME", "CT_LABEL")
    val rows = out.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    rows shouldBe Set(
      ("CL:1", "alveolar cell", "AT1"),
      ("CL:2", "basal cell", "BC"),
      (Wrangle.CtIdUnknown, "no id cell", "NL"))
  }

  test("enrich: broadcast lookup join, 'NaN' definition sentinel, null-propagating all_text") {
    val asctb = Seq(
      ("CL:1", "alveolar cell", "AT1"),
      ("CL:2", "basal cell", null),      // null CT_LABEL → all_text falls back to CT_NAME
      ("CL:3", "unknown cell", "UK"))    // no lookup row → definition 'NaN'
      .toDF("CT_ID", "CT_NAME", "CT_LABEL")
    val lookup = Seq(
      ("CL_1", "alveolar label", "a type I pneumocyte"),
      ("CL_2", "basal label", "a basal epithelial cell"))
      .toDF("ct_id_underscore", "label", "definition")
    val out = Wrangle.enrich(asctb, lookup).collect()
      .map(r => r.getAs[String]("CT_ID") ->
        (r.getAs[String]("definition"), r.getAs[String]("all_text"))).toMap
    out("CL:1") shouldBe (("a type I pneumocyte", "alveolar cell AT1 a type I pneumocyte"))
    // null CT_LABEL nulls the concat (null-propagating!) → fallback to CT_NAME
    out("CL:2") shouldBe (("a basal epithelial cell", "basal cell"))
    out("CL:3") shouldBe (("NaN", "unknown cell UK NaN"))
  }

  test("enrichOnline: one fetch per DISTINCT id, output identical to offline enrich") {
    val asctb = Seq(
      ("CL:1", "alveolar cell", "AT1"),
      ("CL:1", "alveolar cell again", "AT1b"), // duplicate id → no refetch
      ("CL:2", "basal cell", "BC"),
      ("CL:9", "unknown cell", "UK"))          // fetch fails → 'NaN'
      .toDF("CT_ID", "CT_NAME", "CT_LABEL")
    def body(label: String, definition: String) =
      s"""{"_embedded":{"terms":[{"label":"$label","annotation":{"definition":["$definition"]}}]}}"""
    // captured by the transport closure: locals only (a matcher or
    // outer-method call in fetch would drag the whole spec — and its
    // SparkSession — into the task closure)
    val bodies = Map(
      "CL_1" -> body("alveolar label", "a type I pneumocyte"),
      "CL_2" -> body("basal label", "a basal epithelial cell"))
    val fetches = spark.sparkContext.longAccumulator("fetches")
    val fake = new Wrangle.Transport {
      override def fetch(url: String): Option[String] = {
        fetches.add(1)
        require(url.startsWith("http://www.ebi.ac.uk/ols/api/ontologies/cl/terms?iri="))
        bodies.get(url.substring(url.lastIndexOf("%2F") + 3)) // miss → non-200
      }
    }
    val online = Wrangle.enrichOnline(asctb, fake)
      .select("CT_ID", "CT_NAME", "definition", "all_text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getString(2), r.getString(3))).toMap
    fetches.value shouldBe 3L // CL:1 (once), CL:2, CL:9 — never per row
    online(("CL:1", "alveolar cell")) shouldBe
      (("a type I pneumocyte", "alveolar cell AT1 a type I pneumocyte"))
    online(("CL:9", "unknown cell")) shouldBe (("NaN", "unknown cell UK NaN"))
    // fixture-identical to the offline path fed the equivalent lookup
    val offline = Wrangle.enrich(asctb, Seq(
        ("CL_1", "alveolar label", "a type I pneumocyte"),
        ("CL_2", "basal label", "a basal epithelial cell"))
        .toDF("ct_id_underscore", "label", "definition"))
      .select("CT_ID", "CT_NAME", "definition", "all_text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getString(2), r.getString(3))).toMap
    online shouldBe offline
  }

  test("parseOlsResponse extracts label and first definition; missing → 'NaN'") {
    val body =
      """{"_embedded":{"terms":[{"label":"type I pneumocyte",
        |"annotation":{"definition":["A squamous cell."]}}]}}""".stripMargin.replace("\n", "")
    val (l, d) = Wrangle.parseOlsResponse(lit(body))
    val (l2, d2) = Wrangle.parseOlsResponse(lit("""{"_embedded":{"terms":[{"label":"x"}]}}"""))
    val row = spark.range(1).select(l.as("l"), d.as("d"), l2.as("l2"), d2.as("d2")).head()
    row.getString(0) shouldBe "type I pneumocyte"
    row.getString(1) shouldBe "A squamous cell."
    row.getString(2) shouldBe "x"
    row.getString(3) shouldBe "NaN"
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ASCT+B sheet wrangling: wide repeated-triplet sheet → 3-column
  * cell-type table, plus ontology enrichment.
  *
  * Re-expresses `utilities/asctb_data_wrangling.py:94-111` (regex
  * column projection, triplet unpivot, dropna, dedup, sentinel
  * impute) and `:188-215` (definition enrichment + `all_text`).
  * The reference's per-triplet pandas concat loop becomes a single
  * `stack()` unpivot — one narrow Catalyst operator, no shuffle; the
  * per-row HTTP enrichment becomes a broadcast join against a
  * (distinct-key) lookup table.
  */
object Wrangle {

  val CtIdUnknown = "ASCTB CT_ID UNK"

  // Faithful reference regexes (`asctb_data_wrangling.py:94-96`) —
  // note the LABEL regex is single-digit in the reference (CT/10/LABEL
  // is dropped) and selected columns sort lexicographically (CT/10
  // sorts before CT/2). Both quirks are reproduced for golden parity;
  // pass `fixed = true` for the corrected behavior.
  private val refRegex = "^CT/[0-9]*/ID$|^CT/[0-9]/LABEL$|^CT/[0-9]*$"
  private val fixedRegex = "^CT/[0-9]+/ID$|^CT/[0-9]+/LABEL$|^CT/[0-9]+$"

  /** Regex-driven projection of the cell-type triplet columns, sorted
    * as the reference sorts them (`asctb_data_wrangling.py:97`). */
  def celltypeColumns(df: DataFrame, fixed: Boolean = false): Seq[String] = {
    val re = if (fixed) fixedRegex else refRegex
    val cols = df.columns.filter(c => c.matches(re))
    if (fixed)
      // numeric level order with NAME < ID < LABEL inside a level
      cols.sortBy { c =>
        val parts = c.split("/")
        (parts(1).toInt, if (parts.length == 2) 0 else if (parts(2) == "ID") 1 else 2)
      }
    else cols.sorted // lexicographic, exactly like sorted() in python
  }

  /** Wide sheet → long 3-column table. Each consecutive column-triplet
    * (in sorted order) becomes rows (CT_NAME, CT_ID, CT_LABEL); rows
    * where the whole triplet is null are dropped per-triplet BEFORE
    * the union, then global dedup + column reorder + CT_ID sentinel
    * impute (`asctb_data_wrangling.py:100-111`).
    *
    * Implementation: a single `stack(n, ...)` projection — Catalyst
    * unpivots without any custom code and without a shuffle; the only
    * shuffle in this stage is the final `dropDuplicates`.
    */
  def wrangle(raw: DataFrame, fixed: Boolean = false): DataFrame = {
    val cols = celltypeColumns(raw, fixed)
    require(cols.nonEmpty, "no CT/* columns matched")
    val triplets = cols.grouped(3).toSeq
    val stackArgs = triplets.map { t =>
      // pad incomplete trailing triplet with null columns (the
      // reference's positional slice just yields fewer columns; a
      // 2-col frame renames to the first 2 names — model as nulls)
      val padded = t.padTo(3, null)
      padded.map(c => if (c == null) "CAST(NULL AS STRING)" else s"`$c`").mkString(", ")
    }
    val stackExpr =
      s"stack(${triplets.size}, ${stackArgs.mkString(", ")}) as (CT_NAME, CT_ID, CT_LABEL)"
    raw.selectExpr(stackExpr)
      .na.drop("all", Seq("CT_NAME", "CT_ID", "CT_LABEL"))
      .dropDuplicates()
      .select("CT_ID", "CT_NAME", "CT_LABEL")
      .withColumn("CT_ID", coalesce(col("CT_ID"), lit(CtIdUnknown)))
  }

  /** Ontology enrichment (`asctb_data_wrangling.py:188-215`): join a
    * definition lookup (offline stand-in for the per-row OLS REST
    * calls), then build `all_text`.
    *
    * The lookup key is the underscore form of CT_ID
    * (`CL:0002062` → `CL_0002062`, `asctb_data_wrangling.py:134,205`).
    * Missing definitions become the string sentinel `'NaN'`
    * (`:170,176-181`). `all_text` is the null-PROPAGATING 3-way
    * concat (any null component nulls the whole, `:206`) with a
    * CT_NAME fallback (`:207`).
    *
    * `olsLookup` schema: (ct_id_underscore: string, label: string,
    * definition: string). It is distinct-keyed and tiny (one row per
    * ontology term), so the join is a broadcast-hash join — the
    * reference's N sequential HTTP round-trips with duplicate
    * refetches (`:205`) become one distinct + one broadcast.
    */
  def enrich(asctb: DataFrame, olsLookup: DataFrame): DataFrame = {
    val lookup = broadcast(
      olsLookup.select(
        col("ct_id_underscore"),
        coalesce(col("definition"), lit("NaN")).as("definition"))
        .dropDuplicates("ct_id_underscore"))
    asctb
      .withColumn("ct_id_underscore", regexp_replace(col("CT_ID"), ":", "_"))
      .join(lookup, Seq("ct_id_underscore"), "left")
      .withColumn("definition", coalesce(col("definition"), lit("NaN")))
      .withColumn("all_text",
        coalesce(
          concat(col("CT_NAME"), lit(" "), col("CT_LABEL"), lit(" "), col("definition")),
          col("CT_NAME")))
      .drop("ct_id_underscore")
  }

  /** url → response body, or None for a failed request (the
    * reference's status_code != 200 check,
    * `asctb_data_wrangling.py:147-148`). Production wires an HTTP
    * client pooled per executor; tests — and this zero-egress build —
    * inject a fake, so the operator's dataflow is fully testable
    * offline. */
  trait Transport extends Serializable {
    def fetch(url: String): Option[String]
  }

  /** OLS term-lookup URL for an underscore-form CT_ID — the
    * reference's ONTOBEE_BASE_URL (`asctb_data_wrangling.py:135`). */
  def olsTermUrl(ctIdUnderscore: String): String =
    "http://www.ebi.ac.uk/ols/api/ontologies/cl/terms?iri=" +
      "http%3A%2F%2Fpurl.obolibrary.org%2Fobo%2F" + ctIdUnderscore

  /** Live-mode ontology enrichment — the online counterpart of
    * [[enrich]] (`asctb_data_wrangling.py:124-137,205`).
    *
    * The reference issues one blocking GET per ROW, refetching
    * duplicate CT_IDs. Here the id set is distinct-reduced first (a
    * shuffle carrying one short string per distinct term), fetched
    * partition-at-a-time via `mapPartitions` — so total fetches =
    * |distinct ids| and they parallelise across executors — and the
    * parsed bodies feed the exact same broadcast-join path as the
    * offline [[enrich]]. Failed fetches parse to the 'NaN' definition
    * sentinel, as in the reference. */
  def enrichOnline(asctb: DataFrame, transport: Transport): DataFrame = {
    val spark = asctb.sparkSession
    import spark.implicits._
    val distinctIds = asctb
      .select(regexp_replace(col("CT_ID"), ":", "_").as("id"))
      .na.drop().distinct()
    val bodies = distinctIds.as[String]
      .mapPartitions(ids => ids.map(id => (id, transport.fetch(olsTermUrl(id)).orNull)))
      .toDF("ct_id_underscore", "body")
    val (label, definition) = parseOlsResponse(col("body"))
    enrich(asctb, bodies.select(
      col("ct_id_underscore"), label.as("label"), definition.as("definition")))
  }

  /** JSON extraction used by the online OLS source (`asctb_data_wrangling.py:155,176-181`):
    * label and first definition from an OLS term response body. */
  def parseOlsResponse(body: org.apache.spark.sql.Column)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val label = get_json_object(body, "$._embedded.terms[0].label")
    val definition = coalesce(
      get_json_object(body, "$._embedded.terms[0].annotation.definition[0]"),
      lit("NaN"))
    (label, definition)
  }
}

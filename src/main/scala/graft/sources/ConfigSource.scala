package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ASCT+B sheet-config source: GitHub contents-API JSON → config
  * table → (url, sheetId, gid) lookup.
  *
  * Re-expresses `utilities/asctb_data_wrangling.py:21-66`: the
  * reference GETs `sheet-config.json` via the GitHub API,
  * base64-decodes the `content` field, json-parses it, then
  * double-loops to find the first entry whose `name` matches
  * case-insensitively and whose version's `viewValue` matches
  * exactly. Config data is catalog-sized, so parsing happens in one
  * driver-light DataFrame pass; in the zero-egress harness the API
  * response body comes from a fixture file instead of the network
  * (the decode/parse/lookup dataflow is identical either way).
  */
object ConfigSource {

  val GoogleSheetsBaseUrl = "https://docs.google.com/spreadsheets/d/"

  private val versionSchema = ArrayType(StructType(Seq(
    StructField("value", StringType), StructField("viewValue", StringType),
    StructField("sheetId", StringType), StructField("gid", StringType))))

  private val configSchema = ArrayType(StructType(Seq(
    StructField("name", StringType),
    StructField("version", versionSchema))))

  /** GitHub contents-API body → decoded config JSON string
    * (`asctb_data_wrangling.py:28-29`; F16 base64 decode — GitHub
    * line-wraps the base64 payload, strip the newlines first). */
  def decodeGithubContent(body: Column): Column =
    unbase64(regexp_replace(get_json_object(body, "$.content"), "\\n", ""))
      .cast("string")

  /** Parse a config JSON string into one row per (organ, version)
    * with positions preserved — the reference's first-match-wins
    * loop (`:59-66`) needs document order. */
  def parseConfig(df: DataFrame, jsonCol: String): DataFrame =
    df
      .select(posexplode(from_json(col(jsonCol), configSchema))
        .as(Seq("organ_pos", "organ")))
      .select(col("organ_pos"), col("organ.name").as("name"),
        posexplode(col("organ.version")).as(Seq("version_pos", "ver")))
      .select(
        col("organ_pos"), col("name"), col("version_pos"),
        col("ver.value").as("version_name"),
        col("ver.viewValue").as("view_value"),
        col("ver.sheetId").as("sheet_id"),
        col("ver.gid").as("gid"))

  /** First (url, sheetId, gid) for a (organ, version) pair —
    * case-insensitive on organ name, exact on viewValue, document
    * order decides ties, exactly like the reference loop. Returns an
    * empty frame when nothing matches (the reference returns None). */
  def lookupSheet(config: DataFrame, organ: String, version: String): DataFrame =
    config
      .filter(lower(col("name")) === organ.toLowerCase && col("view_value") === version)
      .orderBy(col("organ_pos"), col("version_pos"))
      .limit(1)
      .select(
        concat(lit(GoogleSheetsBaseUrl), col("sheet_id")).as("url"),
        col("sheet_id"), col("gid"))

  /** Full pipeline from a raw GitHub API response body. */
  def sheetUrlFromApiBody(spark: SparkSession, apiBody: String,
                          organ: String, version: String): DataFrame = {
    import spark.implicits._
    val decoded = Seq(apiBody).toDF("body")
      .select(decodeGithubContent(col("body")).as("config_json"))
    lookupSheet(parseConfig(decoded, "config_json"), organ, version)
  }
}

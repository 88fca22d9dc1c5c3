package graft

import java.util.Base64

import org.scalatest.matchers.should.Matchers

import graft.sources.ConfigSource

class ConfigSourceSpec extends SparkSpec with Matchers {

  private val configJson =
    """[
      |  {"name": "Lung",
      |   "version": [
      |     {"value": "lung-v1.1", "viewValue": "v1.1", "sheetId": "SHEET_A", "gid": "11"},
      |     {"value": "lung-v1.2", "viewValue": "v1.2", "sheetId": "SHEET_B", "gid": "22"}]},
      |  {"name": "Kidney",
      |   "version": [
      |     {"value": "kid-v1.1", "viewValue": "v1.1", "sheetId": "SHEET_C", "gid": "33"}]},
      |  {"name": "lung",
      |   "version": [
      |     {"value": "dup-v1.2", "viewValue": "v1.2", "sheetId": "SHEET_DUP", "gid": "99"}]}
      |]""".stripMargin

  /** GitHub wraps base64 content at 60 chars with newlines — mirror that. */
  private def githubBody(json: String): String = {
    val b64 = Base64.getEncoder.encodeToString(json.getBytes("UTF-8"))
      .grouped(60).mkString("\\n")
    s"""{"name": "sheet-config.json", "encoding": "base64", "content": "$b64"}"""
  }

  test("decode + parse + first-match lookup (case-insensitive organ, exact version)") {
    val out = ConfigSource.sheetUrlFromApiBody(
      spark, githubBody(configJson), organ = "LUNG", version = "v1.2").collect()
    out.length shouldBe 1
    out.head.getAs[String]("url") shouldBe ConfigSource.GoogleSheetsBaseUrl + "SHEET_B"
    out.head.getAs[String]("sheet_id") shouldBe "SHEET_B"
    out.head.getAs[String]("gid") shouldBe "22"
  }

  test("document order decides between duplicate matches (first wins, like the reference loop)") {
    // both entries 0 ("Lung") and 2 ("lung") match; entry 0 must win
    val out = ConfigSource.sheetUrlFromApiBody(
      spark, githubBody(configJson), organ = "lung", version = "v1.2").head()
    out.getAs[String]("sheet_id") shouldBe "SHEET_B"
  }

  test("no match → empty result (reference returns None)") {
    ConfigSource.sheetUrlFromApiBody(
      spark, githubBody(configJson), organ = "Heart", version = "v9").count() shouldBe 0L
  }
}

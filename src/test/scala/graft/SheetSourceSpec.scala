package graft

import java.nio.file.Files

import org.scalatest.matchers.should.Matchers

import graft.sources.SheetSource

class SheetSourceSpec extends SparkSpec with Matchers {

  test("csvSkipRows drops the N-line preamble and parses the real header") {
    val dir = Files.createTempDirectory("sheetsource").toFile
    val f = new java.io.File(dir, "sheet.csv")
    val preamble = (1 to 10).map(i => s"junk line $i,,,")
    val body = Seq(
      "CT/1,CT/1/ID,CT/1/LABEL",
      "alveolar cell,CL:1,AT1",
      "\"quoted, cell\",CL:2,BC")
    Files.write(f.toPath, (preamble ++ body).mkString("\n").getBytes)

    val df = SheetSource.csvSkipRows(spark, f.getAbsolutePath, skipRows = 10)
    df.columns.toSeq shouldBe Seq("CT/1", "CT/1/ID", "CT/1/LABEL")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    rows shouldBe Set(
      ("alveolar cell", "CL:1", "AT1"),
      ("quoted, cell", "CL:2", "BC"))
  }
}

package graft

import java.nio.file.Files

import org.scalatest.matchers.should.Matchers

import graft.sources.Sinks

class SinksSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("reportCsv writes exactly one headered part file that round-trips") {
    val dir = Files.createTempDirectory("sinks").toFile
    val path = new java.io.File(dir, "report").getAbsolutePath
    val df = Seq(("a", 1), ("b", 2)).toDF("label", "n")
    Sinks.reportCsv(df, path)
    val parts = new java.io.File(path).listFiles().filter(_.getName.endsWith(".csv"))
    parts should have length 1
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    back.collect().map(r => (r.getString(0), r.getInt(1))).toSet shouldBe
      Set(("a", 1), ("b", 2))
  }

  test("bulkCsv preserves partition parallelism") {
    val dir = Files.createTempDirectory("sinks").toFile
    val path = new java.io.File(dir, "bulk").getAbsolutePath
    Sinks.bulkCsv(spark.range(100).repartition(4).toDF("id"), path)
    val parts = new java.io.File(path).listFiles().filter(_.getName.endsWith(".csv"))
    parts.length shouldBe 4
    spark.read.option("header", "true").csv(path).count() shouldBe 100L
  }
}

package graft

import java.nio.file.Files

import org.scalatest.matchers.should.Matchers

import graft.sources.CachedParquet

class CachedParquetSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("readThrough builds once, then serves from the cache") {
    val dir = Files.createTempDirectory("cachedparquet").toFile
    val path = new java.io.File(dir, "table").getAbsolutePath
    var builds = 0
    def build = { builds += 1; Seq((1, "a"), (2, "b")).toDF("id", "v") }

    CachedParquet.exists(spark, path) shouldBe false
    val first = CachedParquet.readThrough(spark, path)(build)
    first.count() shouldBe 2L
    builds shouldBe 1
    CachedParquet.exists(spark, path) shouldBe true

    val second = CachedParquet.readThrough(spark, path)(build)
    second.count() shouldBe 2L
    builds shouldBe 1 // cache hit: builder not invoked again
    second.collect().map(r => (r.getInt(0), r.getString(1))).toSet shouldBe
      Set((1, "a"), (2, "b"))
  }
}

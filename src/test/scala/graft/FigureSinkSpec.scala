package graft

import javax.imageio.ImageIO

import org.scalatest.matchers.should.Matchers

import graft.operators.Analyze
import graft.sources.FigureSink

class FigureSinkSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def pngMagic(path: String): Boolean = {
    val in = new java.io.FileInputStream(path)
    try {
      val b = new Array[Byte](8)
      in.read(b) shouldBe 8
      b.take(4).toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G')
    } finally in.close()
  }

  test("vennPng renders the vennCounts3 output to a real PNG") {
    val a = Seq(1, 2, 3, 4).toDF("k")
    val b = Seq(3, 4, 5).toDF("k")
    val c = Seq(4, 5, 6).toDF("k")
    val counts = Analyze.vennCounts3(a, b, c)
    val path = java.nio.file.Files.createTempDirectory("graft_fig_").toString + "/venn.png"
    FigureSink.vennPng(counts, path, labels = Seq("A", "B", "C"), title = "probe")
    pngMagic(path) shouldBe true
    val img = ImageIO.read(new java.io.File(path))
    img.getWidth shouldBe 700
    img.getHeight shouldBe 700
    // the three translucent circles must actually be drawn: more than
    // background + text colors present
    val colors = (for (x <- 0 until img.getWidth by 7; y <- 0 until img.getHeight by 7)
      yield img.getRGB(x, y)).toSet
    colors.size should be > 4
  }

  test("vennPng2 renders the vennCounts2 output to a real PNG") {
    val a = Seq(1, 2, 3, 4).toDF("k")
    val b = Seq(3, 4, 5).toDF("k")
    val counts = Analyze.vennCounts2(a, b)
    val path = java.nio.file.Files.createTempDirectory("graft_fig_").toString + "/venn2.png"
    FigureSink.vennPng2(counts, path, labels = Seq("A", "B"), title = "probe2")
    pngMagic(path) shouldBe true
    val img = ImageIO.read(new java.io.File(path))
    img.getWidth shouldBe 700
    img.getHeight shouldBe 500
    val colors = (for (x <- 0 until img.getWidth by 7; y <- 0 until img.getHeight by 7)
      yield img.getRGB(x, y)).toSet
    colors.size should be > 3
  }

  test("scatterPng downsamples deterministically and renders points") {
    val pts = (1 to 500).map(i => (i.toLong, math.sin(i * 0.1), math.cos(i * 0.07)))
      .toDF("id", "x", "y")
    val path = java.nio.file.Files.createTempDirectory("graft_fig_").toString + "/sc.png"
    FigureSink.scatterPng(pts, "x", "y", Seq("id"), path, maxPoints = 100)
    pngMagic(path) shouldBe true
    val img = ImageIO.read(new java.io.File(path))
    img.getWidth shouldBe 800
    // points were drawn (non-white, non-border pixels exist)
    val colors = (for (x <- 0 until img.getWidth by 3; y <- 0 until img.getHeight by 3)
      yield img.getRGB(x, y)).toSet
    colors.size should be > 2
    // deterministic: rendering the same input twice is byte-identical
    val path2 = path + "2.png"
    FigureSink.scatterPng(pts, "x", "y", Seq("id"), path2, maxPoints = 100)
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)).toSeq shouldBe
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path2)).toSeq
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.VectorOps

class VectorOpsSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    Seq((a, b)).toDF("a", "b")
      .select(VectorOps.cosine(col("a"), col("b")).as("c"))
      .head().getDouble(0)

  test("cosine of identical vectors is 1") {
    cos(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)) shouldBe 1.0 +- 1e-12
  }

  test("cosine of orthogonal vectors is 0") {
    cos(Seq(1.0, 0.0), Seq(0.0, 1.0)) shouldBe 0.0 +- 1e-12
  }

  test("cosine of opposite vectors is -1") {
    cos(Seq(1.0, -2.0), Seq(-1.0, 2.0)) shouldBe -1.0 +- 1e-12
  }

  test("zero vectors score 0 under ANSI mode instead of DIVIDE_BY_ZERO (sklearn parity)") {
    // this crashed q24 at sf0.1 in round 2 (ADVICE high)
    cos(Seq(0.0, 0.0), Seq(1.0, 2.0)) shouldBe 0.0
    cos(Seq(0.0, 0.0), Seq(0.0, 0.0)) shouldBe 0.0
  }

  test("cosineWithNorms matches cosine when norms are precomputed") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(3.0, 2.0, 1.0))).toDF("a", "b")
      .withColumn("na", VectorOps.l2Norm(col("a")))
      .withColumn("nb", VectorOps.l2Norm(col("b")))
    val Array(full, withNorms) = df.select(
      VectorOps.cosine(col("a"), col("b")),
      VectorOps.cosineWithNorms(col("a"), col("na"), col("b"), col("nb")))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    withNorms shouldBe full +- 1e-15
  }

  test("normalize yields unit norm; zero vector passes through") {
    val df = Seq(Tuple1(Seq(3.0, 4.0)), Tuple1(Seq(0.0, 0.0))).toDF("v")
      .select(VectorOps.l2Norm(VectorOps.normalize(col("v"))).as("n"))
      .collect().map(_.getDouble(0))
    df(0) shouldBe 1.0 +- 1e-12
    df(1) shouldBe 0.0
  }

  test("int8 quantization: bounded reconstruction error, zero vector to zeros, cosine preserved") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(40)(Tuple1(Seq.fill(16)(rnd.nextDouble() * 4 - 2))) :+
      Tuple1(Seq.fill(16)(0.0))
    val df = rows.toDF("v")
      .withColumn("scale", VectorOps.quantScale(col("v")))
      .withColumn("q", VectorOps.quantizeInt8(col("v"), col("scale")))
      .withColumn("back", VectorOps.dequantizeInt8(col("q"), col("scale")))
    val out = df.select(col("scale"),
        array_max(zip_with(col("v"), col("back"), (x, y) => abs(x - y))).as("err"),
        VectorOps.cosine(col("v"), col("back")).as("cos"),
        array_max(transform(col("q"), _.cast("int").cast("double"))).as("qmax"))
      .collect()
    out.foreach { r =>
      val scale = r.getDouble(0)
      // half-step quantization bound
      r.getDouble(1) should be <= scale / 127 / 2 + 1e-12
      if (scale > 0) r.getDouble(2) should be >= 0.999
      r.getDouble(3) should be <= 127.0
    }
    // zero vector: scale 0, all-zero bytes, exact round trip
    val z = out.last
    z.getDouble(0) shouldBe 0.0
    z.getDouble(1) shouldBe 0.0
  }

  test("cosine stays within [-1, 1] over random vectors (property)") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(50)((Seq.fill(8)(rnd.nextDouble() * 10 - 5),
      Seq.fill(8)(rnd.nextDouble() * 10 - 5)))
    val vals = rows.toDF("a", "b")
      .select(VectorOps.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    all(vals) should (be >= -1.0 - 1e-9 and be <= 1.0 + 1e-9)
  }
}

package graft

import org.scalatest.matchers.should.Matchers

import graft.operators.Bitext

/** Pins the margin-mining criterion: exact integer margins, mutual
  * best-by-margin intersection, and hub exclusion. */
class BitextSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("marginMine: hand-computed margins, mutual pairs only, hub partner excluded") {
    // X = even ids {x0=(1,0), x2=(0,1)}; Y = odd {y1=(1,0), y3=(0,1),
    // y5=(0.8,0.6) — the 'hub' closer to everything}
    val xs = Seq((0L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val ys = Seq((1L, Seq(1.0, 0.0)), (3L, Seq(0.0, 1.0)),
      (5L, Seq(0.8, 0.6))).toDF("vec_id", "embedding")
    val out = Bitext.marginMine(xs, ys, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("cos_micro"), r.getAs[Long]("margin_micro"),
        r.getAs[Boolean]("mined"))).sortBy(_._1).toSeq
    // k=2 penalties: px(x0)=1.8e6, px(x2)=1.6e6, py(y1)=py(y3)=1e6
    // margin(x0,y1) = 1e6*4e6 div 2.8e6 = 1428571
    // margin(x2,y3) = 1e6*4e6 div 2.6e6 = 1538461
    out shouldBe Seq(
      (0L, 1L, 1000000L, 1428571L, true),
      (2L, 3L, 1000000L, 1538461L, true))
    // the hub y5 is nobody's mutual best: its own best (x0) prefers y1
    out.map(_._2) should not contain 5L
  }

  test("marginMine: negative-cosine candidates never surface") {
    val xs = Seq((0L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val ys = Seq((1L, Seq(-1.0, 0.0)), (3L, Seq(-0.9, 0.1)))
      .toDF("vec_id", "embedding")
    Bitext.marginMine(xs, ys, "vec_id", "embedding", k = 2)
      .count() shouldBe 0L
  }
}

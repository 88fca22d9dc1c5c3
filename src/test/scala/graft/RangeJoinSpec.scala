package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("matches the brute-force inequality join exactly (dense keys/times)") {
    val left = spark.range(0, 300).select(
      col("id").as("lid"), (col("id") % 7).as("lk"),
      (col("id") * 13 % 401).as("lt"))
    val right = spark.range(0, 400).select(
      col("id").as("rid"), (col("id") % 7).as("rk"),
      (col("id") * 17 % 401).as("rt"))

    for ((lo, hi) <- Seq((-25L, 0L), (0L, 25L), (-10L, 10L), (5L, 5L))) {
      val got = RangeJoin.intervalJoin(left, right, "lk", "rk", "lt", "rt", lo, hi)
        .select("lid", "rid")
      val brute = left.join(right,
          col("lk") === col("rk") &&
            col("rt") >= col("lt") + lo && col("rt") <= col("lt") + hi)
        .select("lid", "rid")
      got.exceptAll(brute).count() shouldBe 0
      brute.exceptAll(got).count() shouldBe 0
      got.count() shouldBe got.distinct().count() // no duplicate pairs
    }
  }

  test("inclusive bounds on both edges") {
    val left = Seq((1L, 100L)).toDF("lk", "lt")
    val right = Seq((1L, 75L), (1L, 74L), (1L, 100L), (1L, 101L))
      .toDF("rk", "rt")
    val got = RangeJoin.intervalJoin(left, right, "lk", "rk", "lt", "rt", -25L, 0L)
      .select("rt").collect().map(_.getLong(0)).toSet
    got shouldBe Set(75L, 100L) // 74 below lower bound, 101 above upper
  }

  test("negative time values bucket correctly") {
    val left = Seq((1L, -100L), (1L, 3L)).toDF("lk", "lt")
    val right = Seq((1L, -95L), (1L, -120L), (1L, 0L)).toDF("rk", "rt")
    val got = RangeJoin.intervalJoin(left, right, "lk", "rk", "lt", "rt", 0L, 10L)
      .select("lt", "rt").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // lt=-100 admits rt in [-100,-90] -> only -95; lt=3 admits [3,13] -> none
    got shouldBe Set((-100L, -95L))
  }

  test("plans a shuffled equality join, not a nested loop") {
    val left = spark.range(0, 1000).select(
      col("id").as("lid"), (col("id") % 7).as("lk"), (col("id") * 3).as("lt"))
    val right = spark.range(0, 1000).select(
      col("id").as("rid"), (col("id") % 7).as("rk"), (col("id") * 5).as("rt"))
    val plan = RangeJoin.intervalJoin(left, right, "lk", "rk", "lt", "rt", -50L, 0L)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 101.0),
    (1L, ts("2024-01-01 10:10:00"), 99.0),
    (2L, ts("2024-01-01 10:07:00"), 50.0)
  ).toDF("q_key", "q_ts", "px")

  private lazy val trades = Seq(
    (10L, 1L, ts("2024-01-01 10:03:00")), // after 10:00 quote
    (11L, 1L, ts("2024-01-01 10:05:00")), // equal ts -> inclusive
    (12L, 1L, ts("2024-01-01 11:00:00")), // latest quote wins
    (13L, 2L, ts("2024-01-01 10:00:00")), // before any quote -> null
    (14L, 3L, ts("2024-01-01 10:00:00"))  // key with no quotes -> null
  ).toDF("trade_id", "t_key", "t_ts")

  private def run() = AsofJoin
    .asofBackward(trades, quotes, "t_key", "q_key", "t_ts", "q_ts")
    .select($"trade_id", $"q_ts", $"px")
    .collect()
    .map(r => r.getLong(0) -> (Option(r.get(1)).map(_.toString), Option(r.get(2))))
    .toMap

  test("matches the latest right row at or before each left time") {
    val m = run()
    m(10L) shouldBe (Some("2024-01-01 10:00:00.0"), Some(100.0))
    m(11L) shouldBe (Some("2024-01-01 10:05:00.0"), Some(101.0)) // inclusive
    m(12L) shouldBe (Some("2024-01-01 10:10:00.0"), Some(99.0))
    m(13L) shouldBe (None, None)
    m(14L) shouldBe (None, None)
  }

  test("is partition-invariant and keeps every left row exactly once") {
    val out = AsofJoin.asofBackward(
      trades.repartition(13), quotes.repartition(7),
      "t_key", "q_key", "t_ts", "q_ts")
    out.count() shouldBe trades.count()
    out.select("trade_id").distinct().count() shouldBe trades.count()
    val m = run()
    AsofJoin.asofBackward(trades.repartition(3), quotes, "t_key", "q_key",
        "t_ts", "q_ts")
      .select($"trade_id", $"q_ts", $"px")
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)).map(_.toString), Option(r.get(2))))
      .toMap shouldBe m
  }

  test("agrees with the brute-force join+rank form on dense data") {
    val right = spark.range(0, 400).select(
      (col("id") % 8).as("k"),
      timestamp_seconds(lit(1700000000L) + col("id") * 37).as("rt"),
      (col("id") * 1.5).as("v"))
    val left = spark.range(0, 300).select(
      col("id").as("lid"), (col("id") % 10).as("lk"),
      timestamp_seconds(lit(1700000000L) + col("id") * 53 + 11).as("lt"))

    val got = AsofJoin.asofBackward(left, right, "lk", "k", "lt", "rt")
      .select("lid", "rt", "v")

    val brute = left.join(right, col("lk") === col("k") && col("rt") <= col("lt"), "left")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("lid").orderBy(col("rt").desc_nulls_last)))
      .filter(col("__rn") === 1)
      .select("lid", "rt", "v")

    got.exceptAll(brute).count() shouldBe 0
    brute.exceptAll(got).count() shouldBe 0
  }

  test("rejects payload/left column name clashes") {
    val bad = quotes.withColumnRenamed("px", "trade_id")
    an[IllegalArgumentException] should be thrownBy
      AsofJoin.asofBackward(trades, bad, "t_key", "q_key", "t_ts", "q_ts")
  }

  test("bucketed form equals the plain form, including carries across EMPTY buckets") {
    // right rows cluster in early buckets; many left rows land in
    // later buckets with no right rows at all — every match must ride
    // the boundary carry across the empty-bucket gap (the exact shape
    // that breaks if a spine row without right rows clobbers the
    // running carry)
    val right = spark.range(0, 40).select(
      (col("id") % 4).as("k"),
      timestamp_seconds(lit(1700000000L) + col("id") * 13).as("rt"),
      (col("id") * 2.0).as("v"))
    val left = spark.range(0, 300).select(
      col("id").as("lid"), (col("id") % 5).as("lk"),
      timestamp_seconds(lit(1700000000L) + col("id") * 997).as("lt"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "rt", "v").collect()
        .map(r => r.getLong(0) ->
          (Option(r.get(1)).map(_.toString), Option(r.get(2)))).toMap
    val plain = norm(AsofJoin.asofBackward(left, right, "lk", "k", "lt", "rt"))
    // small bucket span (in the ts domain, seconds): forces many
    // empty buckets between the right cluster and the left tail
    val bucketed = norm(AsofJoin.asofBackwardBucketed(
      left, right, "lk", "k", "lt", "rt", bucketSpan = 1000L))
    bucketed shouldBe plain
    plain.count(_._2._1.isDefined) should be > 50 // carries actually fired
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Salting

class SaltingSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("saltedSumCount equals the plain aggregate under a planted hot key, " +
      "at every bucket count, and is partition-invariant") {
    // one key carries 90% of the rows — the shape that serializes a
    // plain final aggregate on one reducer
    val rows = ((1L to 900L).map(i => ("hot", i)) ++
      (1L to 100L).map(i => (s"k${i % 7}", i))).toDF("k", "v")
    val plain = rows.groupBy("k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n_rows"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for (buckets <- Seq(1, 4, 16)) {
      val salted = Salting.saltedSumCount(rows, "k", $"v", buckets)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      withClue(s"buckets=$buckets: ") { salted shouldBe plain }
    }
    val repart = Salting.saltedSumCount(rows.repartition(13), "k", $"v", 16)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    repart shouldBe plain
  }

  test("the salt actually spreads the hot key across sub-groups") {
    val rows = (1L to 1000L).map(i => ("hot", i)).toDF("k", "v")
    val salt = pmod(abs(hash($"v")).cast("long"), lit(16L))
    val nSubGroups = rows.select(salt.as("s")).distinct().count()
    nSubGroups should be > 8L // 16 buckets, 1000 distinct values
  }
}

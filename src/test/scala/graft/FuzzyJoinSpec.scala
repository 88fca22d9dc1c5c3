package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private lazy val catalog = Seq(
    (1L, "spark"), (2L, "sparks"), (3L, "shark"), (4L, "flink"), (5L, "")
  ).toDF("cat_id", "name")

  test("matches exactly the pairs within the edit-distance budget") {
    val queries = Seq((10L, "spark"), (11L, "sparkk"), (12L, "blink"), (13L, "x"))
      .toDF("q_id", "q")
    val got = FuzzyJoin.editDistanceJoin(queries, catalog, "q", "name", 1)
      .select($"q_id", $"cat_id", $"dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    got shouldBe Set(
      (10L, 1L, 0), (10L, 2L, 1), (10L, 3L, 1), // spark: itself, sparks, shark
      (11L, 1L, 1), (11L, 2L, 1),               // sparkk
      (12L, 4L, 1)                              // blink ~ flink
      // "x": dist 1 from "" requires len diff 1 -> ("", dist 1)
      , (13L, 5L, 1)
    )
  }

  test("agrees with the brute-force cross join + levenshtein") {
    val queries = spark.range(0, 120).select(
      col("id").as("q_id"),
      concat(lit("item"), (col("id") % 40).cast("string")).as("q"))
    val cat = spark.range(0, 150).select(
      col("id").as("cat_id"),
      concat(lit("item"), (col("id") % 60).cast("string")).as("name"))
    val got = FuzzyJoin.editDistanceJoin(queries, cat, "q", "name", 2)
      .select("q_id", "cat_id", "dist")
    val brute = queries.crossJoin(cat)
      .withColumn("dist", levenshtein(col("q"), col("name")))
      .filter(col("dist") <= 2)
      .select("q_id", "cat_id", "dist")
    got.exceptAll(brute).count() shouldBe 0
    brute.exceptAll(got).count() shouldBe 0
  }

  test("segment-blocked variant equals brute force on high-cardinality strings") {
    // distinct values everywhere -> the distinct-value trick cannot help;
    // this is the workload the segment path exists for
    val queries = spark.range(0, 250).select(
      col("id").as("q_id"),
      concat(lit("user_"), col("id").cast("string"), lit("_x")).as("q"))
    val cat = spark.range(0, 300).select(
      col("id").as("cat_id"),
      concat(lit("user_"), (col("id") + 5).cast("string"), lit("_y")).as("name"))
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.editDistanceJoinSegmented(queries, cat, "q", "name", d)
        .select("q_id", "cat_id", "dist")
      val brute = queries.crossJoin(cat)
        .withColumn("dist", levenshtein(col("q"), col("name")))
        .filter(col("dist") <= d)
        .select("q_id", "cat_id", "dist")
      got.exceptAll(brute).count() shouldBe 0
      brute.exceptAll(got).count() shouldBe 0
    }
  }

  test("segment-blocked variant: short and empty strings still pair (tiny fallback)") {
    val queries = Seq((1L, ""), (2L, "a"), (3L, "ab"), (4L, "abcdef")).toDF("q_id", "q")
    val cat = Seq((10L, "a"), (11L, ""), (12L, "abcdeg"), (13L, "zz")).toDF("cat_id", "name")
    val got = FuzzyJoin.editDistanceJoinSegmented(queries, cat, "q", "name", 1)
      .select("q_id", "cat_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = queries.crossJoin(cat)
      .filter(levenshtein(col("q"), col("name")) <= 1)
      .select("q_id", "cat_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe brute
  }

  test("maxDist=0 degenerates to exact equality") {
    val queries = Seq((1L, "spark"), (2L, "nope")).toDF("q_id", "q")
    FuzzyJoin.editDistanceJoin(queries, catalog, "q", "name", 0)
      .select("q_id", "cat_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe Set((1L, 1L))
  }
}

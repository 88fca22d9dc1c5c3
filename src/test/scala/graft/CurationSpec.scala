package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Curation

class CurationSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private lazy val docs = spark.range(0, 2000).toDF("doc_id")

  test("split is deterministic and partition-invariant") {
    val weights = Seq("train" -> 90, "valid" -> 5, "test" -> 5)
    val a = Curation.deterministicSplit(docs, "doc_id", weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Curation.deterministicSplit(docs.repartition(17), "doc_id", weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    b shouldBe a
    // fractions land near the weights (md5 is uniform)
    val n = a.size.toDouble
    a.values.count(_ == "train") / n shouldBe 0.90 +- 0.03
    a.values.count(_ == "valid") / n shouldBe 0.05 +- 0.02
    a.values.count(_ == "test") / n shouldBe 0.05 +- 0.02
  }

  test("assignments are stable under corpus growth (incremental curation)") {
    val weights = Seq("train" -> 4, "test" -> 1)
    val small = Curation.deterministicSplit(docs.filter($"doc_id" < 500),
      "doc_id", weights).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val big = Curation.deterministicSplit(docs, "doc_id", weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    small.foreach { case (id, s) => big(id) shouldBe s }
  }

  test("sample filter and membership flag agree; salts draw independently") {
    val kept = Curation.deterministicSample(docs, "doc_id", 1, 10)
      .collect().map(_.getLong(0)).toSet
    val flagged = docs.select($"doc_id",
        Curation.inSample($"doc_id", 1, 10).as("f"))
      .collect().filter(_.getBoolean(1)).map(_.getLong(0)).toSet
    flagged shouldBe kept
    kept.size.toDouble / 2000 shouldBe 0.10 +- 0.03
    // a different salt draws an (almost) independent subset
    val other = Curation.deterministicSample(docs, "doc_id", 1, 10, salt = "other")
      .collect().map(_.getLong(0)).toSet
    other should not be kept
    (kept.intersect(other).size.toDouble / 2000) shouldBe 0.01 +- 0.015
  }

  test("degenerate weights: single label covers everything") {
    Curation.deterministicSplit(docs, "doc_id", Seq("all" -> 1))
      .select("split").distinct().collect().map(_.getString(0)).toSeq shouldBe Seq("all")
  }
}

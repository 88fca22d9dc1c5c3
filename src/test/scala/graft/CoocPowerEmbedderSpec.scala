package graft

import org.scalatest.matchers.should.Matchers

import graft.embed.CoocPowerEmbedder

class CoocPowerEmbedderSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "crimson apple beside yellow banana"),
    (2L, "crimson apple beside purple plum"),
    (3L, "yellow banana beside purple plum"),
    (4L, "iron gear inside copper engine"),
    (5L, "iron gear inside steel piston"),
    (6L, "copper engine inside steel piston"))
    .toDF("doc_id", "body")

  private def collectVecs(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toSeq)
      .sortBy(_._1).toSeq

  test("fit is partition-invariant by construction (no sort/coalesce contract)") {
    val base = collectVecs(CoocPowerEmbedder.fitVectors(
      corpus, "doc_id", "body", dim = 16, rounds = 2))
    val repart = collectVecs(CoocPowerEmbedder.fitVectors(
      corpus.repartition(7), "doc_id", "body", dim = 16, rounds = 2))
    val shuffled = collectVecs(CoocPowerEmbedder.fitVectors(
      corpus.orderBy($"doc_id".desc).repartition(3), "doc_id", "body",
      dim = 16, rounds = 2))
    repart shouldBe base
    shuffled shouldBe base
    base should not be empty
  }

  test("trajectory stays integer micro-bounded; rounds=0 is the ±micro init") {
    val init = collectVecs(CoocPowerEmbedder.fitVectors(
      corpus, "doc_id", "body", dim = 8, rounds = 0, micro = 1000L))
    init.foreach { case (_, v) =>
      v should have size 8
      all(v.map(math.abs)) shouldBe 1000.0
    }
    val trained = collectVecs(CoocPowerEmbedder.fitVectors(
      corpus, "doc_id", "body", dim = 8, rounds = 3, micro = 1000L))
    trained.foreach { case (_, v) =>
      v.foreach { x =>
        x shouldBe math.rint(x) // every weight stays an exact integer
        math.abs(x) should be <= 1000.0
      }
    }
  }

  test("diffusion pulls co-occurring words together across documents") {
    val vecs = collectVecs(CoocPowerEmbedder.fitVectors(
      corpus, "doc_id", "body", dim = 32, rounds = 2)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // fruit-cluster words share contexts; machine-cluster words share
    // theirs; cross-cluster pairs share nothing
    val within = cos(vecs("apple"), vecs("banana"))
    val across = cos(vecs("apple"), vecs("gear"))
    within should be > across
    cos(vecs("gear"), vecs("piston")) should be > cos(vecs("banana"), vecs("piston"))
  }

  test("join-apply (no driver vocab) is bit-identical to the broadcast kernel") {
    val vectors = CoocPowerEmbedder.fitVectors(corpus, "doc_id", "body",
      dim = 16, rounds = 2)
    val broadcastOut = CoocPowerEmbedder.fit(corpus, "doc_id", "body",
        dim = 16, rounds = 2)
      .embed(corpus, "body", "vec")
      .select("doc_id", "vec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // include an all-OOV row and an empty-text row: both must produce
    // the zero vector on BOTH paths
    val extra = Seq((7L, "zzzqx wwwqy"), (8L, "")).toDF("doc_id", "body")
    val joinOut = CoocPowerEmbedder.embedJoined(corpus.union(extra), "doc_id",
        "body", "vec", vectors, dim = 16)
      .select("doc_id", "vec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    (1L to 6L).foreach { id =>
      joinOut(id) shouldBe broadcastOut(id) // exact, not approximate
    }
    joinOut(7L) shouldBe Seq.fill(16)(0.0)
    joinOut(8L) shouldBe Seq.fill(16)(0.0)
  }

  test("embedJoined fails fast on a dim/vectors-table width mismatch") {
    val vectors = CoocPowerEmbedder.fitVectors(corpus, "doc_id", "body",
      dim = 16, rounds = 1)
    def chain(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} ${chain(t.getCause)}"
    val ex = intercept[Throwable] {
      CoocPowerEmbedder.embedJoined(corpus, "doc_id", "body", "vec",
        vectors, dim = 8).collect()
    }
    chain(ex) should include("embedJoined")
  }

  test("fit wraps as QuantizedVocabEmbedder and embeds through the shared seam") {
    val emb = CoocPowerEmbedder.fit(corpus, "doc_id", "body", dim = 16, rounds = 2)
    val out = emb.embed(corpus, "body", "vec")
      .select("doc_id", "vec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    out should have size 6
    // embedded vectors are L2-normalized (or zero)
    out.values.foreach { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      n shouldBe 1.0 +- 1e-9
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.embed.Word2VecEmbedder

/** Pins the trained Word2Vec embedder (SURVEY §2.6 T4's "MLlib
  * embeddings" option): deterministic fit, embed contract (dim,
  * normalization, OOV → zero vector), and that a corpus document's
  * nearest neighbour under the trained vectors is itself. */
class EmbedderSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "alveolar epithelial cell lines the lung alveolus"),
    (2L, "basal cell of the airway epithelium"),
    (3L, "ciliated cell moves mucus in the airway"),
    (4L, "goblet cell secretes mucus in the airway epithelium"),
    (5L, "alveolar macrophage clears the lung alveolus"))
    .toDF("id", "text")

  test("fit is deterministic: same corpus + seed => identical word vectors") {
    val a = Word2VecEmbedder.fit(corpus, "text", dim = 16, seed = 7L)
    val b = Word2VecEmbedder.fit(corpus, "text", dim = 16, seed = 7L)
    val va = a.wordVector("cell").get
    val vb = b.wordVector("cell").get
    va.toSeq shouldBe vb.toSeq // exact: numPartitions=1 + fixed seed
  }

  test("embed adds an L2-normalized dim-d vector; all-OOV text maps to the zero vector") {
    val emb = Word2VecEmbedder.fit(corpus, "text", dim = 16)
    val out = emb.embed(
      Seq((1L, "alveolar cell"), (2L, "zzz qqq www")).toDF("id", "text"),
      "text", "vec")
    val rows = out.select(col("id"), col("vec")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows(1L) should have size 16
    math.sqrt(rows(1L).map(x => x * x).sum) shouldBe 1.0 +- 1e-9
    // every token OOV → averaged vector is zero; normalize passes it through
    rows(2L).forall(_ == 0.0) shouldBe true
  }

  test("flagship smoke with the trained embedder: self-match at similarity 1") {
    val emb = Word2VecEmbedder.fit(corpus, "text", dim = 16)
    val embedded = emb.embed(corpus, "text", "embedding")
    val top = graft.operators.Ann.bruteForceTopK(
        embedded.select(col("id").as("qid"), col("embedding")),
        embedded.select(col("id").as("cid"), col("embedding")),
        "qid", "cid", "embedding", k = 1)
      .collect().map(r => r.getLong(r.fieldIndex("q_id")) ->
        r.getLong(r.fieldIndex("c_id"))).toMap
    // identical text → identical vector → cosine 1 with itself; ties
    // break to the lower id, and ids are distinct per text here
    top.foreach { case (q, c) => c shouldBe q }
  }

  test("Md5HashingEmbedder: bucket counts from md5-56 mod dim, then L2 normalize") {
    val emb = new graft.embed.Md5HashingEmbedder(dim = 8)
    val out = emb.embed(Seq((1L, "alpha beta alpha")).toDF("id", "text"), "text", "vec")
      .select(col("vec")).collect().head.getSeq[Double](0)
    out should have size 8
    // expected: clean-dedup tokens of "alpha beta alpha" = [alpha, beta]
    // (dedup drops the repeat), each hashed md5-56 mod 8 once
    def bucket(t: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.substring(0, 14), 16) % 8).toInt
    }
    val toks = graft.functions.TextNlp.tokensCleanDedup("alpha beta alpha")
    toks shouldBe Seq("alpha", "beta")
    val counts = Array.fill(8)(0.0)
    toks.foreach(t => counts(bucket(t)) += 1.0)
    val nrm = math.sqrt(counts.map(x => x * x).sum)
    val expected = counts.map(_ / nrm).toSeq
    out.zip(expected).foreach { case (a, b) => a shouldBe b +- 1e-12 }
  }

  test("Md5HashingEmbedder: empty/all-stopword text maps to the zero vector") {
    val emb = new graft.embed.Md5HashingEmbedder(dim = 8)
    val out = emb.embed(Seq((1L, "the and of")).toDF("id", "text"), "text", "vec")
      .select(col("vec")).collect().head.getSeq[Double](0)
    out.forall(_ == 0.0) shouldBe true
  }
}

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

  test("QuantizedVocabEmbedder: weights are exact multiples of 2^-20 with no -0.0") {
    val w2v = Word2VecEmbedder.fit(corpus, "text", dim = 16)
    val q = graft.embed.QuantizedVocabEmbedder.fromWord2Vec(w2v, dim = 16)
    q.vocab should not be empty
    q.vocab.foreach { case (_, v) =>
      v.foreach { x =>
        val scaled = x * 1048576.0
        scaled shouldBe math.rint(scaled) // exact multiple of 2^-20
        java.lang.Double.doubleToRawLongBits(x) should not be
          java.lang.Double.doubleToRawLongBits(-0.0) // -0.0 canonicalized
      }
    }
  }

  test("QuantizedVocabEmbedder: embed equals the manual replay " +
       "(OOV-inclusive denominator, exact order-free token sum, L2 normalize)") {
    val w2v = Word2VecEmbedder.fit(corpus, "text", dim = 16)
    val q = graft.embed.QuantizedVocabEmbedder.fromWord2Vec(w2v, dim = 16)
    val vocab = q.vocab.toMap
    val text = "goblet cell zzzoov mucus"
    val out = q.embed(Seq((1L, text)).toDF("id", "text"), "text", "vec")
      .select(col("vec")).collect().head.getSeq[Double](0)
    val toks = graft.functions.TextNlp.tokensCleanDedup(text)
    val n = toks.size
    // sum in REVERSED token order: the quantized sum must be exact,
    // hence order-free — the property the SQL oracle's plain group
    // aggregate relies on
    val sum = new Array[Double](16)
    toks.reverse.foreach(t => vocab.get(t).foreach { v =>
      (0 until 16).foreach(d => sum(d) += v(d))
    })
    val avg = sum.map(_ * (1.0 / n))
    val nrm = math.sqrt(avg.map(x => x * x).sum)
    val expected = if (nrm == 0.0) avg.toSeq else avg.map(_ / nrm).toSeq
    out.zip(expected).foreach { case (a, b) => assert(a == b) } // bit-exact
  }

  test("QuantizedVocabEmbedder: empty and all-OOV texts map to the zero vector") {
    val w2v = Word2VecEmbedder.fit(corpus, "text", dim = 16)
    val q = graft.embed.QuantizedVocabEmbedder.fromWord2Vec(w2v, dim = 16)
    val out = q.embed(
        Seq((1L, ""), (2L, "zzz qqq www")).toDF("id", "text"), "text", "vec")
      .select(col("id"), col("vec"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    out(1L).forall(_ == 0.0) shouldBe true
    out(2L).forall(_ == 0.0) shouldBe true
  }

  test("fitSampled: deterministic sample membership => identical vectors " +
       "whatever the partitioning; vocabulary limited to sampled docs") {
    val wide = (1L to 40L).map(i =>
      (i, s"tok$i alveolar cell airway epithelium sample"))
      .toDF("id", "text")
    val a = graft.embed.Word2VecEmbedder
      .fitSampled(wide, "text", "id", num = 1, den = 2, dim = 8)
    val b = graft.embed.Word2VecEmbedder
      .fitSampled(wide.repartition(7), "text", "id", num = 1, den = 2, dim = 8)
    a.vocabVectors.map { case (w, v) => w -> v.toSeq } shouldBe
      b.vocabVectors.map { case (w, v) => w -> v.toSeq }
    // per-doc marker tokens of UNSAMPLED docs never enter the vocabulary
    val sampled = (1L to 40L).filter(i =>
      graft.operators.Curation.deterministicSample(
        wide.filter(col("id") === i), "id", 1, 2, "w2vfit").count() == 1)
    val vocabWords = a.vocabVectors.map(_._1).toSet
    sampled.foreach(i => vocabWords should contain(s"tok$i"))
    (1L to 40L).filterNot(sampled.contains)
      .foreach(i => vocabWords should not contain s"tok$i")
  }

  test("QuantizedVocabEmbedder: preserves the trained embedder's nearest-neighbour ranking") {
    val w2v = Word2VecEmbedder.fit(corpus, "text", dim = 16)
    val q = graft.embed.QuantizedVocabEmbedder.fromWord2Vec(w2v, dim = 16)
    def top1(e: graft.embed.Embedder): Map[Long, Long] = {
      val embedded = e.embed(corpus, "text", "embedding")
      graft.operators.Ann.bruteForceTopK(
          embedded.select(col("id").as("qid"), col("embedding")),
          embedded.select(col("id").as("cid"), col("embedding")),
          "qid", "cid", "embedding", k = 1)
        .collect().map(r => r.getLong(r.fieldIndex("q_id")) ->
          r.getLong(r.fieldIndex("c_id"))).toMap
    }
    top1(q) shouldBe top1(w2v) // ≤2^-21 per-weight perturbation never flips self-match
  }
}

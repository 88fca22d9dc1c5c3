package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("languageId: marker hits pick the language; ties break lexicographically") {
    val docs = Seq(
      (1L, "el perro y la casa de los vecinos en madrid"),
      (2L, "the cat and the dog are in the house"),
      (3L, "xyzzy plugh")). // zero hits everywhere → tie → first code ("de")
      toDF("doc_id", "text")
    val out = TextAnalysis.languageId(docs)
      .select("doc_id", "predicted_lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe "es"
    out(2L) shouldBe "en"
    out(3L) shouldBe "de"
  }

  test("qualityMetrics ratios are in [0,1] and favour clean english prose") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and runs away"),
      (2L, "000000 111111 ### $$$ %%% 999999")).toDF("doc_id", "text")
    val rows = TextAnalysis.qualityMetrics(docs)
      .select("doc_id", "alpha_ratio", "digit_ratio", "punct_ratio",
        "stopword_ratio", "quality_score")
      .collect().map(r => r.getLong(0) -> r).toMap
    for (r <- rows.values; i <- 1 to 4)
      r.getDouble(i) should (be >= 0.0 and be <= 1.0)
    rows(1L).getAs[Double]("quality_score") should be >
      rows(2L).getAs[Double]("quality_score")
  }

  test("tokenStats counts whitespace and subword tokens") {
    val out = TextAnalysis.tokenStats(Seq((1L, "hello world 12345")).toDF("doc_id", "text"))
      .select("ws_tokens", "subword_tokens", "chars_per_ws_token").head()
    out.getInt(0) shouldBe 3
    // hell+o wor+ld 123+45 → 6 subword pieces
    out.getInt(1) shouldBe 6
    out.getDouble(2) shouldBe (17.0 / 3) +- 1e-6
  }

  test("fingerprint is whitespace/punctuation/case robust") {
    val df = Seq(
      (1L, "Hello, World!"), (2L, "hello   world"), (3L, "HELLO-WORLD"),
      (4L, "different words")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprints(df)
      .select("doc_id", "fingerprint")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    fps(1L) shouldBe fps(2L)
    fps(2L) shouldBe fps(3L)
    fps(4L) should not be fps(1L)
  }

  test("stupidBackoffScore: every ladder rung hand-checked at exact micros") {
    // train "a b c a b d": c1 a2 b2 c1 d1 (N=6, V=4);
    // c2 (a,b)2 (b,c)1 (c,a)1 (b,d)1; c3 abc/bca/cab/abd ×1
    val train = Seq((100L, "a b c a b d")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c"), // trigram rung: 1/2
      (2L, "a b x"), // OOV w: α²·(0+1)/(N+V)
      (3L, "c a b"), // trigram rung: 1/1
      (4L, "b c d"), // bigram (c,d) unseen, d seen: α²·(1+1)/(N+V)
      (5L, "a a b"), // trigram miss, bigram (a,b) rung: α·(2/2)
      (6L, "a b")    // <3 tokens → dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.stupidBackoffScore(train, score, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def m(p: Double) = math.round(math.log(p) * 1e6)
    out(1L) shouldBe ((1L, m(1.0 / 2.0)))
    out(2L) shouldBe ((1L, m(0.4 * 0.4 * (1.0 / 10.0))))
    out(3L) shouldBe ((1L, m(1.0)))
    out(4L) shouldBe ((1L, m(0.4 * 0.4 * (2.0 / 10.0))))
    out(5L) shouldBe ((1L, m(0.4 * (2.0 / 2.0))))
    out.contains(6L) shouldBe false
    out.contains(100L) shouldBe false // train docs are not scored
  }

  test("stupidBackoffScore counts repeated instances and is partition-invariant") {
    val train = Seq((100L, "a b c a b d")).toDF("doc_id", "text")
    // 9 tokens → 7 trigram instances: abc ×3 (1/2 each), bca ×2 (1/1), cab ×2 (1/1)
    val score = Seq((7L, "a b c a b c a b c")).toDF("doc_id", "text")
    def m(p: Double) = math.round(math.log(p) * 1e6)
    val expected = (7L, 3L * m(0.5))
    for (parts <- Seq(1, 7)) {
      val out = TextAnalysis.stupidBackoffScore(
          train.repartition(parts), score.repartition(parts), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toList
      out shouldBe List(expected)
      out.head._2 shouldBe 3L * m(0.5)
    }
    TextAnalysis.stupidBackoffScore(train, score, "doc_id", "text")
      .head().getLong(1) shouldBe 7L
  }

  test("repetitionMetrics: hand-computed fractions and keep flag") {
    val docs = Seq(
      // 6 words, 3 distinct; "buy now" ×2 of 5 bigrams; trigram
      // "buy now buy" ×2 of 4 → dup coverage 2 trigram occurrences
      (1L, "buy now buy now buy again"),
      (2L, "all six words here are distinct")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionMetrics(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    out(1L).getAs[Int]("n_words") shouldBe 6
    out(1L).getAs[Double]("word_rep_ratio") shouldBe 0.5
    out(1L).getAs[Double]("top_bigram_frac") shouldBe (2.0 * 2 / 6)
    out(1L).getAs[Double]("dup_trigram_frac") shouldBe (2.0 * 3 / 6)
    out(1L).getAs[Boolean]("repetition_keep") shouldBe false
    out(2L).getAs[Double]("word_rep_ratio") shouldBe 0.0
    out(2L).getAs[Double]("top_bigram_frac") shouldBe (1.0 * 2 / 6)
    out(2L).getAs[Double]("dup_trigram_frac") shouldBe 0.0
    out(2L).getAs[Boolean]("repetition_keep") shouldBe false // bigram 1/3 > 0.2
  }

  test("RepetitionStatsExpr equals the relational explode+aggregate form") {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    val docs = Seq(
      (1L, "a b a b a b c"), (2L, "x"), (3L, "x y"), (4L, "q q q q q q"),
      (5L, "the quick brown fox jumps over the lazy dog the quick brown fox"))
      .toDF("doc_id", "text")
    val kernel = docs.select(col("doc_id"), toColumn(
        graft.functions.RepetitionStatsExpr(
          toExpression(split(col("text"), "\\s+")))).as("s"))
      .select(col("doc_id"), col("s.n_words"), col("s.n_distinct"),
        col("s.top_bigram"), col("s.dup_trigram"))
      .collect().map(r => (r.getLong(0),
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    val relational = docs.collect().map { r =>
      val words = r.getString(1).split("\\s+").toSeq
      val bi = words.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val tri = words.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      val topBi = if (bi.isEmpty) 0 else bi.groupBy(identity).values.map(_.size).max
      val dupTri = tri.groupBy(identity).values.map(_.size).filter(_ > 1).sum
      (r.getLong(0), (words.size, words.distinct.size, topBi, dupTri))
    }.toMap
    kernel shouldBe relational
  }

  test("expandContractionsColumn: map join expands, order preserved, empties round-trip") {
    val df = Seq(
      (1L, "I'm sure it's fine"),
      (2L, "Don't  stop"),          // double space → empty token preserved
      (3L, "no contractions here"),
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.expandContractionsColumn(df, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("expanded")).toMap
    out(1L) shouldBe "I am sure it is fine" // capitalized variant entries fire too
    out(2L) shouldBe "Do not  stop"        // Title-case entry + empty token kept
    out(3L) shouldBe "no contractions here"
    out(4L) shouldBe ""
    // matches the per-token JVM function on single tokens
    graft.functions.TextNlp.expandContractions("it's") shouldBe "it is"
  }

  test("removeFrequentUnits strips corpus-frequent units, keeps order, handles edge docs") {
    import graft.operators.TextAnalysis
    // "BOILER" appears in 4 docs (> maxDocFreq=2); content units are rare
    val docs = Seq(
      (1L, Seq("BOILER", "u1a", "u1b")),
      (2L, Seq("u2a", "BOILER", "u2b")),
      (3L, Seq("u3a", "BOILER")),
      (4L, Seq("BOILER", "BOILER")),   // all-boilerplate doc -> empty result
      (5L, Seq("u5a"))
    ).toDF("doc_id", "units")
    val out = TextAnalysis.removeFrequentUnits(docs, "doc_id", "units", 2L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    out(1L) shouldBe ((3L, 1L, "u1a u1b"))
    out(2L) shouldBe ((3L, 1L, "u2a u2b"))
    out(3L) shouldBe ((2L, 1L, "u3a"))
    out(4L) shouldBe ((2L, 2L, ""))    // row survives with empty cleaned text
    out(5L) shouldBe ((1L, 0L, "u5a"))
    // duplicate units inside ONE doc don't make it corpus-frequent
    val oneDoc = Seq((9L, Seq("x", "x", "x", "y"))).toDF("doc_id", "units")
    val m = TextAnalysis.removeFrequentUnits(oneDoc, "doc_id", "units", 2L)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    m(9L) shouldBe "x x x y"
  }

  test("removeFrequentUnits is partition-invariant") {
    import graft.operators.TextAnalysis
    val docs = (0L until 100L).map(i =>
      (i, Seq("COMMON", s"unique_$i", s"also_$i"))).toDF("doc_id", "units")
    val a = TextAnalysis.removeFrequentUnits(docs, "doc_id", "units", 50L)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val b = TextAnalysis.removeFrequentUnits(docs.repartition(13), "doc_id", "units", 50L)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    b shouldBe a
    a(7L) shouldBe "unique_7 also_7"
  }

  test("bm25 matches the formula computed by hand on a tiny corpus") {
    val docs = Seq(
      (1L, "cat dog cat"),       // cat tf=2, dl=3
      (2L, "dog bird"),          // dl=2
      (3L, "fish fish fish cat") // cat tf=1, dl=4
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "doc_id", "text", Seq("cat"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_terms_matched"), r.getAs[Double]("bm25")))).toMap

    val (n, avgdl, dfCat, k1, b) = (3.0, 3.0, 2.0, 1.2, 0.75)
    val idf = math.log(1 + (n - dfCat + 0.5) / (dfCat + 0.5))
    def score(tf: Double, dl: Double) =
      idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    out.keySet shouldBe Set(1L, 3L) // doc 2 has no query term -> absent
    out(1L)._1 shouldBe 1L
    out(1L)._2 shouldBe score(2, 3) +- 1e-12
    out(3L)._2 shouldBe score(1, 4) +- 1e-12
    // more occurrences of the term (same length class) rank higher
    out(1L)._2 should be > out(3L)._2
  }

  test("bm25: rarer terms contribute more; partition-invariant") {
    val docs = Seq(
      (1L, "rare common common common"),
      (2L, "common common"), (3L, "common rare extra"),
      (4L, "common filler words here"), (5L, "common again")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "doc_id", "text", Seq("rare", "common"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    // doc 3 (rare + common, short) outscores doc 2 (common only)
    out(3L) should be > out(2L)
    val repart = TextAnalysis.bm25(docs.repartition(7), "doc_id", "text",
        Seq("rare", "common"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    repart.keySet shouldBe out.keySet
    out.foreach { case (k, v) => repart(k) shouldBe v +- 1e-12 }
  }

  test("unigramLogProb: exact integer-micro sums, corpus-frequency model, partition-invariant") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b"),   // a:2 b:1
      (2L, "a c"),     // a:1 c:1
      (3L, "b")        // b:1
    ).toDF("doc_id", "text")
    // corpus: a=3, b=2, c=1, N=6
    val out = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def lp(f: Long) = math.round(math.log(f.toDouble / 6.0) * 1e6)
    out(1L) shouldBe ((3L, 2 * lp(3) + lp(2)))
    out(2L) shouldBe ((2L, lp(3) + lp(1)))
    out(3L) shouldBe ((1L, lp(2)))
    val repart = TextAnalysis.unigramLogProb(docs.repartition(5), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    repart shouldBe out // integer sums: no accumulation-order drift
    // the persist seam: scoring from pre-aggregated (persisted) counts
    // is the same function
    val counts = TextAnalysis.tokenCounts(docs, "doc_id", "text").persist()
    try {
      TextAnalysis.unigramLogProbFromCounts(counts, "doc_id")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap shouldBe out
    } finally counts.unpersist()
  }

  test("bigramLogProb: hand-computed interpolated scores, adjacency from order, " +
      "short docs drop, partition-invariant") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"), // bigrams: (a,b) x2, (b,a) x1
      (2L, "b a"),     // bigrams: (b,a) x1
      (3L, "c")        // no bigrams: excluded
    ).toDF("doc_id", "text")
    // unigrams: a=3, b=3, c=1, N=7
    // f2: (a,b)=2, (b,a)=2; fc: a=2, b=2
    val out = TextAnalysis.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def lp(f2: Long, fc: Long, f1: Long) =
      math.round(math.log(0.75 * (f2.toDouble / fc.toDouble)
        + 0.25 * (f1.toDouble / 7.0)) * 1e6)
    val ab = lp(2, 2, 3) // P(b|a) interpolated with P_uni(b)
    val ba = lp(2, 2, 3)
    out(1L) shouldBe ((3L, 2 * ab + ba))
    out(2L) shouldBe ((1L, ba))
    assert(!out.contains(3L))
    val repart = TextAnalysis.bigramLogProb(docs.repartition(5), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    repart shouldBe out
  }

  test("bigramLogProb: lambda=1 is the pure bigram MLE; empty-token runs collapse") {
    import spark.implicits._
    // doubled whitespace must not create empty-string tokens or bigrams
    val docs = Seq((1L, "x  y"), (2L, "x y")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs, "doc_id", "text", lambda = 1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // both docs: the single bigram (x,y), f2=2, fc=2 -> ln(1)=0
    out(1L) shouldBe ((1L, 0L))
    out(2L) shouldBe ((1L, 0L))
  }

  test("charEntropy: exact integer micros; uniform text maxes, repeated text zeroes") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa"), (2L, "abcd"), (3L, "aabb")).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out(1L) shouldBe ((4L, 0L)) // -ln(1) = 0: no information
    // uniform over 4 symbols: each contributes round(ln 4 * 1e6) * 1
    val ln4 = math.round(math.log(4.0) * 1e6)
    out(2L) shouldBe ((4L, 4 * ln4))
    val ln2 = math.round(math.log(2.0) * 1e6)
    out(3L) shouldBe ((4L, 4 * ln2))
    // partition invariance (integer sums)
    TextAnalysis.charEntropy(docs.repartition(3), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap shouldBe out
  }

  test("chunkTokens: overlapping windows with provenance; short and empty docs") {
    import spark.implicits._
    val words = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words), (2L, "a b"), (3L, ""), (4L, "   "))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(docs, "doc_id", "text",
        chunkSize = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // doc 1: starts 0,3,6,9 (step 3) over 10 tokens
    out((1L, 0L)) shouldBe ((0L, 4L, "w1 w2 w3 w4"))
    out((1L, 1L)) shouldBe ((3L, 4L, "w4 w5 w6 w7")) // 1-token overlap
    out((1L, 2L)) shouldBe ((6L, 4L, "w7 w8 w9 w10"))
    out((1L, 3L)) shouldBe ((9L, 1L, "w10")) // tail clipped
    // doc 2: one short chunk
    out((2L, 0L)) shouldBe ((0L, 2L, "a b"))
    // empty / whitespace-only docs produce no chunks
    out.keys.map(_._1).toSet shouldBe Set(1L, 2L)
  }

  test("cdcChunks: chunks reassemble the text exactly; edits stay local; " +
      "short and empty texts") {
    import spark.implicits._
    val body = (1 to 60).map(i => s"token$i").mkString(" ")
    val docs = Seq(
      (1L, body),
      (2L, body + " EDITED-TAIL-ONLY"), // suffix edit
      (3L, "tiny"),                     // shorter than k
      (4L, "")                          // empty
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        TextAnalysis.cdcChunks(col("text"), k = 8, maskBits = 5).as("ch"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // losslessness: concatenation restores the original
    out(1L).mkString shouldBe body
    out(2L).mkString shouldBe body + " EDITED-TAIL-ONLY"
    out(1L).foreach(c => assert(c.nonEmpty))
    // edit locality: a suffix edit leaves every chunk before the edit
    // point identical — fixed-size chunking would share only a prefix
    // window's worth
    val shared = out(1L).zip(out(2L)).takeWhile { case (a, b) => a == b }
    assert(shared.length >= out(1L).length - 1,
      s"suffix edit disturbed more than the final chunk: " +
        s"${shared.length} of ${out(1L).length} chunks survive")
    out(3L) shouldBe Seq("tiny")
    out(4L) shouldBe Seq.empty
    // boundary contract: each non-final chunk ends where the rolling
    // hash of its trailing 8 codepoints hits the 2^5 mask — recompute
    // directly from the definition
    val mod = 1000000007L
    def gramHash(s: String, start: Int): Long =
      (start until start + 8).foldLeft(0L)((a, i) => (a * 257 + s(i)) % mod)
    var pos = 0
    out(1L).dropRight(1).foreach { c =>
      pos += c.length
      assert(gramHash(body, pos - 8) % 32 == 0, s"no boundary at $pos")
    }
  }

  test("duplicateSpans: planted cross-doc repeat recovered exactly; " +
    "islands merge overlaps and split on gaps; short docs empty") {
    // docs 1 and 2 share a 7-token run → positions 3..9 in doc 1
    // (grams at 3,4,5 with n=3 → one merged island [3, 9]); doc 3 is
    // unique; doc 4 too short for any gram; doc 5 empty.
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"one two $shared tail1 tail2"),
      (2L, s"$shared completely different ending here"),
      (3L, "nothing here repeats at all ever once"),
      (4L, "too short"),
      (5L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.duplicateSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    out(1L) shouldBe ((11L, 1L, 7L, 7L * 1000000L / 11L))
    out(2L) shouldBe ((11L, 1L, 7L, 7L * 1000000L / 11L))
    out(3L) shouldBe ((7L, 0L, 0L, 0L))
    out(4L) shouldBe ((2L, 0L, 0L, 0L))
    out(5L) shouldBe ((0L, 0L, 0L, 0L))
  }

  test("duplicateSpans: within-doc repetition marks both sites; " +
    "disjoint repeats form separate spans; partition-invariant") {
    // "a b c" appears twice INSIDE doc 10, separated by a unique gap
    // longer than n, so the two occurrences are two distinct spans.
    val docs = Seq(
      (10L, "a b c filler1 filler2 filler3 filler4 a b c"),
      (11L, "totally unrelated words live here today")).toDF("doc_id", "text")
    val out = TextAnalysis.duplicateSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out(10L) shouldBe ((10L, 2L, 6L))
    out(11L) shouldBe ((6L, 0L, 0L))
    // same result under any input partitioning
    val p7 = TextAnalysis.duplicateSpans(docs.repartition(7), "doc_id", "text", n = 3)
      .orderBy("doc_id").collect().toSeq
    val p1 = TextAnalysis.duplicateSpans(docs.coalesce(1), "doc_id", "text", n = 3)
      .orderBy("doc_id").collect().toSeq
    p7 shouldBe p1
  }

  test("duplicateSpans: adjacent-but-not-overlapping spans merge " +
    "(gap of exactly one position boundary)") {
    // doc 20 repeats doc 21's grams "p q r" and "s t u" back to back:
    // hits [1,3] and [4,6] are adjacent (4 == 3 + 1) → ONE span [1,6].
    val docs = Seq(
      (20L, "p q r s t u"),
      (21L, "p q r x1 x2 x3 s t u")).toDF("doc_id", "text")
    val out = TextAnalysis.duplicateSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    out(20L) shouldBe ((1L, 6L))   // merged single span covering all 6
    out(21L) shouldBe ((2L, 6L))   // two disjoint spans of 3
  }

  test("pmiCollocations: hand-computed PMI on a tiny corpus; min-count floor; " +
      "deterministic tie order") {
    // "a b" appears 3x; tokens: a=3, b=3, c=2; bigrams: ab,ab,ab,bc,bc -> 5
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "doc_id", "text",
        minCount = 2L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(5)))).toMap
    val nTok = 8.0; val nBg = 5.0
    def pmiMicro(f2: Double, fu: Double, fv: Double): Long =
      math.round(math.log((f2 / nBg) / ((fu / nTok) * (fv / nTok))) * 1e6)
    out.keySet shouldBe Set(("a", "b"), ("b", "c"))
    out(("a", "b")) shouldBe ((3L, pmiMicro(3, 3, 3)))
    out(("b", "c")) shouldBe ((2L, pmiMicro(2, 3, 2)))
    // min-count floor: a singleton bigram never surfaces
    val floored = TextAnalysis.pmiCollocations(
        Seq((1L, "x y"), (2L, "p q"), (3L, "p q")).toDF("doc_id", "text"),
        "doc_id", "text", minCount = 2L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)))
    floored shouldBe Array(("p", "q"))
  }

  test("scrubSharedChunks: shared chunks dropped everywhere, unique " +
      "docs reassemble to their exact original text, empty survives") {
    val banner = "subscribe to our newsletter today for the latest " +
      "updates and offers from the site please do it now thanks"
    val organic1 = "the quick brown fox considered the lazy dog with " +
      "a measure of genuine professional respect and continued on"
    val organic2 = "completely unrelated discussion of spark plans " +
      "and shuffle boundaries in a distributed execution engine"
    val docs = Seq(
      (1L, banner), (2L, banner), (3L, banner), // df = 3 -> scrubbed
      (4L, organic1), (5L, organic2),           // unique -> untouched
      (6L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.scrubSharedChunks(docs, "text", "doc_id",
        k = 8, maskBits = 4, maxDf = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L, 6L)
    Seq(1L, 2L, 3L).foreach { id =>
      out(id)._1 shouldBe 0L          // nothing kept
      out(id)._2 should be >= 1L      // every chunk dropped
      out(id)._3 shouldBe ""
    }
    // unique docs reassemble EXACTLY (order-preserving concat)
    out(4L)._2 shouldBe 0L
    out(4L)._3 shouldBe organic1
    out(5L)._3 shouldBe organic2
    out(6L) shouldBe ((0L, 0L, ""))
    // partition-invariant
    val re = TextAnalysis.scrubSharedChunks(docs.repartition(7), "text",
        "doc_id", k = 8, maskBits = 4, maxDf = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    re shouldBe out
  }

  test("invertedIndex: hand-computed delta postings, df bounds, " +
      "case-fold, empty-token drop, partition-invariant") {
    val docs = Seq(
      (10L, "Spark spark JOIN"),
      (13L, "join   the shuffle"), // double space: empty token dropped
      (25L, "the spark shuffle shuffle"),
      (40L, "the")).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, "doc_id", "text")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // spark: docs 10(tf2), 25(tf1) -> gaps 10,15
    out("spark") shouldBe ((2L, 3L, "10:2,15:1"))
    out("join") shouldBe ((2L, 2L, "10:1,3:1"))
    out("shuffle") shouldBe ((2L, 3L, "13:1,12:2"))
    out("the") shouldBe ((3L, 3L, "13:1,12:1,15:1"))
    out.size shouldBe 4
    // minDf drops hapax terms, maxDf caps stopwords
    val bounded = TextAnalysis.invertedIndex(docs, "doc_id", "text",
        minDf = 2L, maxDf = 2L)
      .collect().map(_.getString(0)).toSet
    bounded shouldBe Set("spark", "join", "shuffle") // "the" df=3 > maxDf
    val re = TextAnalysis.invertedIndex(docs.repartition(5), "doc_id", "text")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    re shouldBe out
  }

  test("tokenDrift: planted mover dominates, matches brute force, " +
      "minCount prunes, partition-invariant") {
    // era A: 30 docs of shared filler; era B: same filler + "zebra"
    val docs = (0 until 30).map(i => (true, "the quick fox")) ++
      (0 until 30).map(i => (false, "the quick fox zebra zebra")) ++
      Seq((true, "rare"))  // 1 occurrence — pruned by minCount 3
    val df = docs.toDF("a", "text")
    val out = TextAnalysis.tokenDrift(df, "text", col("a"),
        minCount = 3L, topK = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    out should not contain key("rare")
    // brute-force replay
    val n1 = 30L * 3 + 1
    val n2 = 30L * 5
    def chi2(c1: Long, c2: Long): Long = {
      val diff = (c1 * n2 - c2 * n1).toDouble
      math.round(1e6 * (diff * diff)
        / (n1.toDouble * n2.toDouble * (c1 + c2).toDouble))
    }
    out("zebra") shouldBe ((0L, 60L, -60L * n1, chi2(0L, 60L)))
    out("the") shouldBe ((30L, 30L, 30L * n2 - 30L * n1, chi2(30L, 30L)))
    // zebra is the top mover
    out.values.map(_._4).max shouldBe out("zebra")._4
    TextAnalysis.tokenDrift(df.repartition(7), "text", col("a"),
        minCount = 3L, topK = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap shouldBe out
  }
  test("cmsStupidBackoffScore: a wide sketch reproduces the exact scorer on " +
      "seen rungs; the bucket-space OOV floor is hand-exact") {
    val train = Seq((100L, "a b c a b d")).toDF("doc_id", "text")
    val score = Seq((1L, "a b c"), (3L, "c a b"), (5L, "a a b"),
      (2L, "a b x")).toDF("doc_id", "text")
    val exact = TextAnalysis.stupidBackoffScore(train, score, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val cms = TextAnalysis.cmsStupidBackoffScore(train, score, "doc_id",
        "text", width = 65536)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // no collisions at this width/corpus -> estimates equal exact counts
    for (id <- Seq(1L, 3L, 5L)) cms(id) shouldBe exact(id)
    // the OOV rung smooths over the BUCKET space, not the vocabulary
    def m(p: Double) = math.round(math.log(p) * 1e6)
    cms(2L) shouldBe m(0.4 * 0.4 * (1.0 / (6.0 + 65536.0)))
  }

  test("repetitionSignals: looped boilerplate fails the gate, varied text passes; " +
      "exact masses; short docs are all-zero and keep") {
    val loop = ("click here " * 30).trim            // one bigram dominates
    val varied = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, loop), (2L, varied), (3L, "only two"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    byId(1L).getAs[Boolean]("gopher_keep") shouldBe false
    byId(2L).getAs[Boolean]("gopher_keep") shouldBe true
    // doc 1: "click here" repeated 30x, "here click" 29x; the top
    // bigram is "click here" (10 chars) with count 30 over
    // 11*30 - 1 = 329 chars
    byId(1L).getAs[Long]("top2_mass_micros") shouldBe
      30L * 10L * 1000000L / 329L
    // dup 5-grams: every 5-gram occurrence in the loop is a duplicate
    byId(1L).getAs[Long]("dup5_mass_micros") should be > 500000L
    // doc 3 has no 5-grams at all -> zero dup/top3+ masses; but its
    // ONLY bigram covers the whole text (mass = 1e6), so the blind
    // threshold gate rejects it — production pipelines front these
    // rules with a min-word-count filter (Gopher does), which is the
    // q17 gate's job, not this operator's
    byId(3L).getAs[Long]("dup5_mass_micros") shouldBe 0L
    byId(3L).getAs[Long]("top3_mass_micros") shouldBe 0L
    byId(3L).getAs[Long]("top2_mass_micros") shouldBe 1000000L
    byId(3L).getAs[Boolean]("gopher_keep") shouldBe false
    // partition invariance
    val b = TextAnalysis.repetitionSignals(docs.repartition(5), "doc_id",
      "text").orderBy("doc_id").collect()
    b.map(_.toString) shouldBe out.map(_.toString)
  }

  test("repetitionSignals: top-gram tie breaks to the lexicographically smallest gram") {
    // "b a" and "a b" both occur twice; tie -> "a b" (7 chars total in
    // text "a b a b a"): bigrams: "a b"x2, "b a"x2
    val docs = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .head()
    // top2 = count 2 * len("a b")=3 * 1e6 div 9 chars
    r.getAs[Long]("top2_mass_micros") shouldBe 2L * 3L * 1000000L / 9L
  }

  test("sbCorpusScores: memoized == fresh scores for both variants; second call serves the same frame") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val hold = graft.operators.Curation.inSample(col("doc_id"), 1, 10, "ppl")
    val freshHeld = TextAnalysis.stupidBackoffScore(
        docs.filter(!hold), docs.filter(hold), "doc_id", "text")
      .collect().map(_.toString).sorted
    val m1 = TextAnalysis.sbCorpusScores(spark, dir, scoreAll = false)
    val m2 = TextAnalysis.sbCorpusScores(spark, dir, scoreAll = false)
    (m2 eq m1) shouldBe true
    m1.collect().map(_.toString).sorted shouldBe freshHeld
    val freshAll = TextAnalysis.stupidBackoffScore(
        docs.filter(!hold), docs, "doc_id", "text")
      .collect().map(_.toString).sorted
    TextAnalysis.sbCorpusScores(spark, dir, scoreAll = true)
      .collect().map(_.toString).sorted shouldBe freshAll
  }

  test("zipfFit: exact f=C/r corpus fits slope -1, r2 = 1, micros replayed") {
    // freqs 12, 6, 4, 3 = 12/r for r = 1..4 -> y = ln 12 - x exactly.
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val docs = Seq(("s", text)).toDF("source", "text")
    val r = TextAnalysis.zipfFit(docs, "source", "text").head()
    // replay the operator's quantization: per-rank micro'd ln, 5 sums,
    // one fixed double expression each
    val pts = Seq((1L, 12L), (2L, 6L), (3L, 4L), (4L, 3L)).map {
      case (rk, f) => (math.round(math.log(rk.toDouble) * 1e6),
        math.round(math.log(f.toDouble) * 1e6))
    }
    val n = pts.size.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val a = n * sxy - sx * sy; val b = n * sxx - sx * sx
    val c = n * syy - sy * sy
    r.getAs[Long]("n_ranks") shouldBe 4L
    r.getAs[Long]("slope_micro") shouldBe
      math.round(1e6 * (a.toDouble / b.toDouble))
    r.getAs[Long]("intercept_micro") shouldBe
      math.round((sy.toDouble - (a.toDouble / b.toDouble) * sx) / n)
    r.getAs[Long]("r2_micro") shouldBe
      math.round(1e6 * (a.toDouble * a / (b.toDouble * c)))
    // semantics: slope ~ -1, r2 ~ 1 (quantization noise only)
    r.getAs[Long]("slope_micro") shouldBe -1000000L +- 5L
    r.getAs[Long]("r2_micro") shouldBe 1000000L +- 5L
  }

  test("zipfFit: topRanks truncates; equal-frequency ranks tie-break on token") {
    // 3 tokens at freq 2 ("x","y","z") and 1 at freq 4 -> ranks by
    // (f desc, tok): w=1, x=2, y=3; topRanks=3 drops z.
    val text = "w w w w x x y y z z"
    val docs = Seq(("s", text)).toDF("source", "text")
    val r3 = TextAnalysis.zipfFit(docs, "source", "text", topRanks = 3).head()
    r3.getAs[Long]("n_ranks") shouldBe 3L
    // degenerate single-rank fit -> b = 0 -> nulls
    val r1 = TextAnalysis.zipfFit(docs, "source", "text", topRanks = 2)
    r1.head().getAs[Long]("n_ranks") shouldBe 2L
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.zipfFit(docs, "source", "text", topRanks = 1)
  }

  test("vocabRichness: hand-computed spectrum — GT unseen mass and Chao1; no-doubleton null") {
    // "a a a b b c d": N=7, V=4, N1={c,d}=2, N2={b}=1
    val docs = Seq(("s", "a a a b b c d")).toDF("source", "text")
    val r = TextAnalysis.vocabRichness(docs, "source", "text").head()
    r.getAs[Long]("n_tokens") shouldBe 7L
    r.getAs[Long]("vocab") shouldBe 4L
    r.getAs[Long]("n_hapax") shouldBe 2L
    r.getAs[Long]("n_dis") shouldBe 1L
    r.getAs[Long]("gt_unseen_micros") shouldBe 2000000L / 7L
    // chao1 = 4 + 2²/(2·1) = 6 -> 6e6 exactly
    r.getAs[Long]("chao1_micros") shouldBe 4000000L + 4000000L / 2L
    // all-singleton corpus: no doubletons -> chao1 null
    val r2 = TextAnalysis.vocabRichness(
        Seq(("t", "x y z")).toDF("source", "text"), "source", "text")
      .head()
    r2.isNullAt(r2.fieldIndex("chao1_micros")) shouldBe true
    r2.getAs[Long]("gt_unseen_micros") shouldBe 1000000L
  }

  test("kneserNeyScore: hand-computed discount ladder — seen, discount-only, and OOV-floor paths") {
    // train "a b c a b d": c3 {abc,bca,cab,abd}=1; ctx3(a,b)=2,n3after=2;
    // bigram types B=4, vocab V=4 -> p1 denom 9
    val train = Seq((0L, "a b c a b d")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c"),  // full ladder: seen trigram
      (2L, "x y z"),  // every level unseen -> p1 floor with cc1=0
      (3L, "b c d")). // seen context, unseen trigram -> pure backoff mass
      toDF("doc_id", "text")
    val out = TextAnalysis.kneserNeyScore(train, score, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Long]("logprob_micros"))).toMap
    def p1(cc1: Long) = (cc1 + 1).toDouble / 9.0
    // doc 1: p3 = (1-.75)/2 + .75*2/2 * ((1-.75)/2 + .75*2/2*p1(1))
    val p2c = math.max(1.0 - 0.75, 0.0) / 2.0 + 0.75 * 2.0 / 2.0 * p1(1)
    val p3c = math.max(1.0 - 0.75, 0.0) / 2.0 + 0.75 * 2.0 / 2.0 * p2c
    out(1L) shouldBe ((1L, math.round(math.log(p3c) * 1e6)))
    // doc 2: all-OOV floor
    out(2L) shouldBe ((1L, math.round(math.log(p1(0)) * 1e6)))
    // doc 3: max(0-.75,0)=0 at both upper levels -> backoff mass only
    val p2d = 0.0 / 1.0 + 0.75 * 1.0 / 1.0 * p1(1)
    val p3d = 0.0 / 1.0 + 0.75 * 1.0 / 1.0 * p2d
    out(3L) shouldBe ((1L, math.round(math.log(p3d) * 1e6)))
  }

  test("interpolatedLmSweep: endpoint lambdas reproduce the pure models bit-exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val score = docs.filter(col("doc_id") % 10 === 0)
    val sweep = TextAnalysis.interpolatedLmSweep(train, score,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Long]("logprob_micros")))
      .toMap
    def total(df: org.apache.spark.sql.DataFrame) = {
      val r = df.agg(sum("n_trigrams"), sum("logprob_micros")).head()
      (r.getLong(0), r.getLong(1))
    }
    sweep(0L) shouldBe total(
      TextAnalysis.stupidBackoffScore(train, score, "doc_id", "text"))
    sweep(8L) shouldBe total(
      TextAnalysis.kneserNeyScore(train, score, "doc_id", "text"))
    // interior rows are a proper mixture: bounded by the endpoints'
    // neighborhood, strictly between the component extremes modulo
    // quantization (monotone here is corpus-dependent, so only bound)
    val lps = (0L to 8L).map(sweep(_)._2)
    lps.min should be >= lps.head.min(lps.last) - 1000000L
  }

  test("heapsFit: cumulative vocab-growth points replayed exactly; saturated vocab fits slope 0") {
    val docs = Seq(
      ("s", 1L, "a b"),              // ct=2,  cv=2
      ("s", 2L, "c d"),              // ct=4,  cv=4
      ("s", 3L, "a b c d e f g h")). // ct=12, cv=8
      toDF("source", "doc_id", "text")
    val r = TextAnalysis.heapsFit(docs, "source", "doc_id", "text").head()
    val pts = Seq((2L, 2L), (4L, 4L), (12L, 8L)).map { case (ct, cv) =>
      (math.round(math.log(ct.toDouble) * 1e6),
        math.round(math.log(cv.toDouble) * 1e6))
    }
    val n = pts.size.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val a = n * sxy - sx * sy; val b = n * sxx - sx * sx
    r.getAs[Long]("n_points") shouldBe 3L
    r.getAs[Long]("slope_micro") shouldBe
      math.round(1e6 * (a.toDouble / b.toDouble))
    // β < 1: vocabulary grows slower than tokens
    r.getAs[Long]("slope_micro") should be < 1000000L
    // closed vocabulary: repeated identical doc → y constant → slope 0,
    // zero y-variance → r² null
    val sat = Seq(("t", 1L, "a b"), ("t", 2L, "a b"))
      .toDF("source", "doc_id", "text")
    val rs = TextAnalysis.heapsFit(sat, "source", "doc_id", "text").head()
    rs.getAs[Long]("slope_micro") shouldBe 0L
    rs.isNullAt(rs.fieldIndex("r2_micro")) shouldBe true
  }

  test("perplexityBuckets: equal terciles, NLL-monotone, exact normalization") {
    // 9 docs in one source, NLL proxy: logprob_micros = -k*1e6 over k
    // trigrams -> nll_per_tri_nanos = 1e9 for all? No: vary the rate.
    val scored = Seq(
      (1L, "s", 2L, -2000000L),  // 1e9 nanos/tri
      (2L, "s", 2L, -4000000L),  // 2e9
      (3L, "s", 2L, -6000000L),  // 3e9
      (4L, "s", 2L, -8000000L),  // 4e9
      (5L, "s", 2L, -10000000L), // 5e9
      (6L, "s", 2L, -12000000L), // 6e9
      (7L, "s", 2L, -14000000L), // 7e9
      (8L, "s", 2L, -16000000L), // 8e9
      (9L, "s", 3L, -10000000L)  // 10/3 e9 -> 3333333333 (floor)
    ).toDF("doc_id", "source", "n_trigrams", "logprob_micros")
    val out = TextAnalysis.perplexityBuckets(scored, "source", "doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("nll_per_tri_nanos"), r.getAs[String]("ppl_bucket")))
      .sortBy(_._1).toSeq
    out.find(_._1 == 9L).get._2 shouldBe (10000000L * 1000L) / 3L
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    byBucket("head") shouldBe Set(1L, 2L, 3L)
    byBucket("middle") shouldBe Set(9L, 4L, 5L) // 3.33e9 sorts before 4e9
    byBucket("tail") shouldBe Set(6L, 7L, 8L)
    // monotone: max head nll <= min middle nll <= ... holds by rank order
    val nll = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    nll("head").max should be <= nll("middle").min
    nll("middle").max should be <= nll("tail").min
  }

}

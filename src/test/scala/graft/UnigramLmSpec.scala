package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.UnigramLm

/** Unigram-LM trainer/encoder
  * ([[graft.operators.UnigramLm]] / [[graft.functions.UnigramSegmentExpr]]):
  * Viterbi DP against a brute-force all-segmentations reference,
  * tie-break and coverage pins, EM cost monotonicity. */
class UnigramLmSpec extends SparkSpec with Matchers {
  import spark.implicits._

  /** Brute force: minimum total cost over ALL segmentations into
    * vocab pieces (ties resolved like the DP: at each cell the
    * shortest last piece wins — realized here by preferring the
    * lexicographically-first candidate list built k-ascending). */
  private def bruteMinCost(word: String, costs: Map[String, Long],
      maxLen: Int): Option[Long] =
    if (word.isEmpty) Some(0L)
    else (1 to math.min(maxLen, word.length)).flatMap { k =>
      val piece = word.substring(word.length - k)
      costs.get(piece).flatMap(c =>
        bruteMinCost(word.dropRight(k), costs, maxLen).map(_ + c))
    } match {
      case s if s.isEmpty => None
      case s => Some(s.min)
    }

  private val vocab = Map(
    "a" -> 900000L, "b" -> 1200000L, "c" -> 1500000L,
    "ab" -> 1400000L, "bc" -> 1300000L, "abc" -> 2100000L,
    "ca" -> 1000000L)

  test("DP cost equals the brute-force minimum over all segmentations") {
    val words = Seq("a", "ab", "abc", "abcabc", "cabcab", "bbbb",
      "acbacb", "ccccab").toDF("word")
    val pieces = vocab.keys.toSeq.sorted
    val costs = pieces.map(vocab)
    val got = words
      .withColumn("__s",
        UnigramLm.segment(col("word"), pieces, costs, 3, 99000000L))
      .select(col("word"), col("__s").getField("cost_micros"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (w <- Seq("a", "ab", "abc", "abcabc", "cabcab", "bbbb",
        "acbacb", "ccccab")) {
      got(w) shouldBe bruteMinCost(w, vocab, 3).get
    }
  }

  test("pieces concatenate back to the word; cost is the piece-cost sum") {
    val words = Seq("abcabc", "cabcab", "abcbcab").toDF("word")
    val pieces = vocab.keys.toSeq.sorted
    val costs = pieces.map(vocab)
    val rows = words
      .withColumn("__s",
        UnigramLm.segment(col("word"), pieces, costs, 3, 99000000L))
      .select(col("word"), col("__s").getField("pieces"),
        col("__s").getField("cost_micros"))
      .collect()
    rows.foreach { r =>
      val ps = r.getSeq[String](1)
      ps.mkString("") shouldBe r.getString(0)
      ps.map(vocab).sum shouldBe r.getLong(2)
    }
  }

  test("equal-cost tie breaks to the SHORTEST last piece at each cell") {
    // "ab" via [a,b] costs 900000+1200000 = 2100000; piece "ab" would
    // need < 2100000 to win; at exactly 2100000 the two-piece path
    // (shorter last piece at both cells) must win deterministically
    val tie = Map("a" -> 900000L, "b" -> 1200000L, "ab" -> 2100000L)
    val pieces = tie.keys.toSeq.sorted
    val costs = pieces.map(tie)
    val r = Seq("ab").toDF("word")
      .withColumn("__s", UnigramLm.segment(col("word"), pieces, costs, 2, 9L))
      .select(col("__s").getField("pieces")).head()
    r.getSeq[String](0) shouldBe Seq("a", "b")
  }

  test("trainViterbiEm: cap binds, single chars always survive, deterministic") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, Seq("banana", "bandana", "cabana", "nab")
        .take(i % 4 + 1).mkString(" "))).toDF("doc_id", "text")
    val a = UnigramLm.trainViterbiEm(docs, "text", rounds = 2,
      maxPieceLen = 3, vocabCap = 10, maxWordLen = 12).collect()
    val b = UnigramLm.trainViterbiEm(docs.repartition(7), "text", rounds = 2,
      maxPieceLen = 3, vocabCap = 10, maxWordLen = 12).collect()
    a.map(_.toString).sorted shouldBe b.map(_.toString).sorted
    val piecesSet = a.map(_.getString(0)).toSet
    // coverage: every corpus character is in the vocab despite the cap
    Set("a", "b", "c", "d", "n").subsetOf(piecesSet) shouldBe true
    a.length should be >= 10
  }

  test("segment saturates instead of wrapping on long out-of-vocab runs") {
    // unkCost = Long.MaxValue/4: five consecutive OOV chars would
    // overflow a naive prev + cost into a negative path that wins the
    // DP. The saturating add must keep costs non-negative and still
    // segment the in-vocab suffix correctly.
    val pieces = Seq("ab")
    val costs = Seq(100L)
    val r = Seq("xxxxxxab").toDF("word")
      .withColumn("__s", UnigramLm.segment(col("word"), pieces, costs, 2,
        Long.MaxValue / 4))
      .select(col("__s").getField("pieces"), col("__s").getField("cost_micros"))
      .head()
    r.getLong(1) should be >= 0L
    // saturated or not, backtrack terminates and is lossless
    r.getSeq[String](0).mkString shouldBe "xxxxxxab"
    // three OOV singles stay finite (3·MaxValue/4 < MaxValue), so the
    // in-vocab "ab" beats the saturated all-singles path
    val r2 = Seq("xxxab").toDF("word")
      .withColumn("__s", UnigramLm.segment(col("word"), pieces, costs, 2,
        Long.MaxValue / 4))
      .select(col("__s").getField("pieces"), col("__s").getField("cost_micros"))
      .head()
    r2.getLong(1) shouldBe Long.MaxValue / 4 * 3 + 100L
    r2.getSeq[String](0) shouldBe Seq("x", "x", "x", "ab")
  }

  test("trainViterbiEmPruned: exact floor-fraction prune, singles survive, bottom-by-count dropped") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, Seq("banana", "bandana", "cabana", "nab")
        .take(i % 4 + 1).mkString(" "))).toDF("doc_id", "text")
    // one round of the UNpruned trainer gives the same seed and the
    // same round-1 Viterbi counts — the prune's inputs
    val unpruned = UnigramLm.trainViterbiEm(docs, "text", rounds = 1,
        maxPieceLen = 3, vocabCap = 24, maxWordLen = 12)
      .collect().map(r => (r.getString(0), r.getLong(2))) // (piece, vc)
    val multi = unpruned.filter(_._1.length > 1)
    val nDrop = multi.length / 4
    val expectDropped = multi.sortBy { case (p, c) => (c, p) }
      .take(nDrop).map(_._1).toSet
    val pruned = UnigramLm.trainViterbiEmPruned(docs, "text", rounds = 1,
        maxPieceLen = 3, vocabCap = 24, maxWordLen = 12,
        pruneNum = 1, pruneDen = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val prunedPieces = pruned.map(_._1).toSet
    prunedPieces shouldBe unpruned.map(_._1).toSet -- expectDropped
    // singles all survive
    unpruned.map(_._1).filter(_.length == 1)
      .foreach(p => prunedPieces should contain(p))
    // counts carried through are the round's counts
    val vcMap = unpruned.toMap
    pruned.foreach { case (p, vc, _) => vc shouldBe vcMap(p) }
    // costs re-normalize over survivors only: exact micro-ln replay
    val totR = pruned.map(_._2).sum
    val v = pruned.length
    pruned.foreach { case (_, vc, w) =>
      w shouldBe math.round(
        -math.log((vc + 1).toDouble / (totR + v).toDouble) * 1e6)
    }
    // a second round shrinks further (monotone vocabulary)
    val twoRounds = UnigramLm.trainViterbiEmPruned(docs, "text",
      rounds = 2, maxPieceLen = 3, vocabCap = 24, maxWordLen = 12,
      pruneNum = 1, pruneDen = 4).count()
    twoRounds should be <= pruned.length.toLong
  }

  test("encodeIds: ordered pieces are lossless per word and agree with encodeStats") {
    val docs = Seq((1L, "banana nab cabana"), (2L, "nab banana"))
      .toDF("doc_id", "text")
    val model = UnigramLm.trainViterbiEm(docs, "text", rounds = 1,
      maxPieceLen = 3, vocabCap = 32, maxWordLen = 12)
      .select("piece", "w_micros")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val ids = UnigramLm.encodeIds(docs, "doc_id", "text",
        model.map(_._1).toSeq, model.map(_._2).toSeq, 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
    // losslessness: pieces of each word occurrence, in piece_idx
    // order, concatenate back to the original word
    val byWord = ids.groupBy(t => (t._1, t._2)).map { case (k, rows) =>
      k -> rows.sortBy(_._3).map(_._4).mkString
    }
    val expected = docs.collect().flatMap { r =>
      r.getString(1).split("\\s+").zipWithIndex
        .map { case (w, i) => (r.getLong(0), i.toLong) -> w }
    }.toMap
    byWord.keySet shouldBe expected.keySet
    byWord.foreach { case (k, w) => w shouldBe expected(k) }
    // token counts agree with encodeStats' rollup
    val stats = UnigramLm.encodeStats(docs, "doc_id", "text",
        model.map(_._1).toSeq, model.map(_._2).toSeq, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val nByDoc = ids.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    nByDoc shouldBe stats
  }

  test("q275 packing invariants: 512-token sequences, doc boundaries, per-split streams") {
    val rows = SparkEntry.queries("q275_token_id_packing")(
      spark, "/root/testdata/sf0.001").collect()
    rows.length should be >= 1
    val bySplit = rows.groupBy(_.getString(0))
    bySplit.foreach { case (_, seqs) =>
      val sorted = seqs.sortBy(_.getLong(1))
      // dense seq ids from 0
      sorted.map(_.getLong(1)).toSeq shouldBe
        (0L until seqs.length.toLong).toSeq
      // every sequence is exactly 512 tokens except possibly the last
      sorted.init.foreach(_.getLong(2) shouldBe 512L)
      sorted.last.getLong(2) should be <= 512L
      // provenance: the stream is doc-ordered, so consecutive
      // sequences overlap in at most the straddling doc
      sorted.sliding(2).foreach {
        case Array(a, b) => b.getLong(4) should be >= a.getLong(5)
        case _ =>
      }
    }
    // every doc closes exactly once: EOS total = doc count
    val docsN = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    rows.map(_.getLong(3)).sum shouldBe docsN
  }

  test("trainViterbiEmMemo / trainViterbiEmPrunedMemo: memoized == fresh vocabulary, second call serves the same frame") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val fresh = UnigramLm.trainViterbiEm(docs, "text", rounds = 2,
        maxPieceLen = 4, vocabCap = 128, maxWordLen = 12)
      .collect().map(_.toString).sorted
    val m1 = UnigramLm.trainViterbiEmMemo(spark, dir, rounds = 2,
      maxPieceLen = 4, vocabCap = 128, maxWordLen = 12)
    val m2 = UnigramLm.trainViterbiEmMemo(spark, dir, rounds = 2,
      maxPieceLen = 4, vocabCap = 128, maxWordLen = 12)
    (m2 eq m1) shouldBe true
    m1.collect().map(_.toString).sorted shouldBe fresh
    val freshP = UnigramLm.trainViterbiEmPruned(docs, "text", rounds = 2,
        maxPieceLen = 4, vocabCap = 128, maxWordLen = 12,
        pruneNum = 1, pruneDen = 4)
      .collect().map(_.toString).sorted
    UnigramLm.trainViterbiEmPrunedMemo(spark, dir, rounds = 2,
        maxPieceLen = 4, vocabCap = 128, maxWordLen = 12,
        pruneNum = 1, pruneDen = 4)
      .collect().map(_.toString).sorted shouldBe freshP
  }

  test("encodeStats: tokens and exact path cost roll up per doc") {
    val docs = Seq((1L, "banana nab"), (2L, "cabana")).toDF("doc_id", "text")
    val model = UnigramLm.trainViterbiEm(docs, "text", rounds = 1,
      maxPieceLen = 3, vocabCap = 32, maxWordLen = 12)
      .select("piece", "w_micros")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val stats = UnigramLm.encodeStats(docs, "doc_id", "text",
        model.map(_._1).toSeq, model.map(_._2).toSeq, 3)
      .orderBy("doc_id").collect()
    stats.length shouldBe 2
    stats(0).getLong(1) shouldBe 2L // n_words
    stats(0).getLong(2) shouldBe 9L // chars: banana+nab
    // token count is between 2 (one piece per word, impossible at
    // maxPieceLen=3 for 6 chars) and 9 (all singles)
    stats(0).getLong(3) should be >= 3L
    stats(0).getLong(3) should be <= 9L
  }
}

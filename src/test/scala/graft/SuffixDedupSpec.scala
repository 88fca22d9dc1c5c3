package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.SuffixDedup

class SuffixDedupSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def lcpCol(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    toColumn(graft.functions.LcpExpr(toExpression(a), toExpression(b)))
  }

  test("LcpExpr: codepoint LCP, multi-byte safety, empty/null edges") {
    val rows = Seq(
      ("abcdef", "abcxyz", 3L),
      ("same", "same", 4L),
      ("", "anything", 0L),
      ("a", "b", 0L),
      ("préfixe", "préfab", 4L), // é is 2 bytes; common chars p,r,é,f
      ("日本語テスト", "日本語デモ", 3L), // 3-byte CJK common prefix
      ("ab", "abcde", 2L))
    rows.foreach { case (a, b, want) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(lcpCol(col("a"), col("b"))).head().getLong(0)
      withClue(s"lcp($a, $b)") { got shouldBe want }
    }
    // null propagates
    Seq((Option.empty[String], Option("x"))).toDF("a", "b")
      .select(lcpCol(col("a"), col("b"))).head().isNullAt(0) shouldBe true
  }

  // a planted corpus: P (59 chars) shared by docs 1 and 2 at different
  // offsets; Q (31 chars) repeated twice INSIDE doc 4; doc 3 unrelated
  private val P = "the quick brown fox jumps over the lazy dog near the river"
  private val Q = "repeated middle filler passage "
  private def planted = Seq(
    (1L, s"alpha head $P alpha tail"),
    (2L, s"beta $P beta ending words"),
    (3L, "nothing shared here at all in this one document text"),
    (4L, s"delta ${Q}interlude ${Q}coda"))

  test("longestRepeatedSubstrings: planted cross-doc passage found with " +
      "EXACT length and positions; within-doc repeat found; deterministic") {
    P.length shouldBe 58
    val docs = planted.toDF("doc_id", "text").repartition(3)
    val out = SuffixDedup.longestRepeatedSubstrings(docs, "doc_id", "text",
        minLcp = 20, maxLcp = 128, k = 40)
      .collect()
    // LEFT-MAXIMALITY: the one-char suffix shifts of each repeat are
    // filtered (equal preceding chars), so the board holds exactly
    // the two distinct maximal repeats:
    // rank 1: " " + P + " " (P.length+2 chars) — both docs surround P
    // with spaces, so the repeat extends one char left and right of
    // the planted passage; left-maximal because the chars before the
    // leading space differ ('d' in "head", 'a' in "beta"). 1-based
    // positions: doc 1 pos 11, doc 2 pos 5.
    out.length shouldBe 2
    val r1 = out.find(_.getLong(0) == 1L).get
    r1.getLong(1) shouldBe (P.length + 2).toLong
    Set(r1.getLong(2), r1.getLong(4)) shouldBe Set(1L, 2L)
    Set(r1.getLong(3), r1.getLong(5)) shouldBe Set(11L, 5L)
    r1.getAs[String]("repeat") shouldBe (" " + P + " ")
    // rank 2: the within-doc " " + Q repeat (leading space shared —
    // preceded by 'a'/'e' — following chars 'i'/'c' differ)
    val r2 = out.find(_.getLong(0) == 2L).get
    r2.getLong(2) shouldBe 4L
    r2.getLong(4) shouldBe 4L
    r2.getLong(1) shouldBe (Q.length + 1).toLong
    r2.getAs[String]("repeat") shouldBe (" " + Q)
  }

  test("lcp CAPS at maxLcp; capped order still finds the repeat") {
    val docs = planted.toDF("doc_id", "text")
    val out = SuffixDedup.longestRepeatedSubstrings(docs, "doc_id", "text",
        minLcp = 20, maxLcp = 30, k = 3) // cap 30 < the 60-char repeat
      .collect()
    out.head.getLong(1) shouldBe 30L // capped, not 60
  }

  // brute-force L-gram coverage (the proof-side of the operator docs)
  private def bruteSpans(docs: Seq[(Long, String)], L: Int): Set[(Long, Long, Long)] = {
    val grams = docs.flatMap { case (d, t) =>
      (0 to t.length - L).map(p => (t.substring(p, p + L), d, p + 1)) }
    val dupG = grams.groupBy(_._1).filter(_._2.size >= 2).keySet
    val cov = grams.filter(g => dupG(g._1))
      .groupBy(_._2)
      .map { case (d, gs) =>
        d -> gs.flatMap(g => g._3 until (g._3 + L)).toSet }
    cov.flatMap { case (d, ps) =>
      val sorted = ps.toSeq.sorted
      val runs = sorted.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }
      runs.map { case (s, e) => (d, s.toLong, e.toLong) }
    }.toSet
  }

  test("repeatedCharSpans == brute-force gram coverage (planted corpus, " +
      "capped AND uncapped regimes, partition-invariant)") {
    val expect = bruteSpans(planted, 20)
    for (parts <- Seq(1, 5); cap <- Seq(128, 20)) {
      val docs = planted.toDF("doc_id", "text").repartition(parts)
      val got = SuffixDedup.repeatedCharSpans(docs, "doc_id", "text",
          minLen = 20, maxLcp = cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      withClue(s"parts=$parts cap=$cap") { got shouldBe expect }
    }
  }

  test("repeatedCharSpans == brute force on a random word-salad corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = Seq("spark", "row", "scan", "agg", "key", "the", "a")
    val docs = (1L to 40L).map(d =>
      (d, (0 until 30).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")))
    val L = 15
    val expect = bruteSpans(docs, L)
    val got = SuffixDedup.repeatedCharSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen = L, maxLcp = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe expect
  }

  test("scrubRepeatedSubstrings: keep-first semantics — canonical " +
      "occurrence survives verbatim, later occurrences cut; short and " +
      "clean docs pass through; reassembly is exact") {
    val docs = planted.toDF("doc_id", "text").repartition(3)
    val out = SuffixDedup.scrubRepeatedSubstrings(docs, "doc_id", "text",
        minLen = 20)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // doc 1 holds the canonical (smallest doc_id) occurrence: untouched
    out(1L)._4 shouldBe planted(0)._2
    out(1L)._3 shouldBe 0L
    // doc 2 loses the shared passage (P + trailing space context): its
    // clean text no longer contains P, but keeps its own prefix
    out(2L)._4.contains(P) shouldBe false
    out(2L)._4.startsWith("beta") shouldBe true
    out(2L)._3 should be >= 59L
    // doc 3 untouched
    out(3L)._4 shouldBe planted(2)._2
    // doc 4: first Q occurrence kept, second cut
    val firstQ = out(4L)._4.indexOf(Q.trim)
    firstQ should be >= 0
    out(4L)._4.indexOf(Q.trim, firstQ + 1) shouldBe -1
    // n_chars always the ORIGINAL length
    out(1L)._1 shouldBe planted(0)._2.length.toLong
    out(4L)._1 shouldBe planted(3)._2.length.toLong
  }

  test("substringContamination: train chars covered by eval-shared " +
      ">=L substrings; clean train docs report zeros; within-train " +
      "repeats do NOT count; matches hand arithmetic") {
    // eval = doc 2 (carries P); train = docs 1, 3, 4
    val evalDf = planted.filter(_._1 == 2L).toDF("doc_id", "text")
    val trainDf = planted.filter(_._1 != 2L).toDF("doc_id", "text")
      .repartition(3)
    val out = SuffixDedup.substringContamination(trainDf, evalDf,
        "doc_id", "text", minLen = 20)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    out.keySet shouldBe Set(1L, 3L, 4L)
    // doc 1 shares " " + P + " " (60 chars) with eval doc 2: one span
    val len1 = planted(0)._2.length.toLong
    out(1L) shouldBe ((len1, 1L, 60L, 60L * 1000000L / len1))
    // doc 3 shares nothing; doc 4's Q repeat is WITHIN train only —
    // never flagged (contamination is vs eval, not self-dup)
    out(3L) shouldBe ((planted(2)._2.length.toLong, 0L, 0L, 0L))
    out(4L) shouldBe ((planted(3)._2.length.toLong, 0L, 0L, 0L))
  }

  test("selfLongestRepeat: within-doc repeat found with exact length " +
      "and positions; cross-doc repeats NEVER count; repeat-free docs " +
      "report zeros; partition-invariant") {
    val docs = planted.toDF("doc_id", "text").repartition(3)
    val out = SuffixDedup.selfLongestRepeat(docs, "doc_id", "text",
        minLen = 20, maxLcp = 64)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getLong(5)))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L)
    // docs 1-3: P is shared CROSS-doc only — no internal repeat
    Seq(1L, 2L, 3L).foreach { d =>
      withClue(s"doc $d") { out(d)._2 shouldBe 0L; out(d)._3 shouldBe None }
    }
    // doc 4: " " + Q repeats internally (32 chars at positions 6 and
    // 47). Positions come out in SUFFIX order, not numeric order:
    // the pos-47 suffix continues "...coda" and the pos-6 suffix
    // "...interlude", and 'c' < 'i', so 47 precedes 6.
    val len4 = planted(3)._2.length.toLong
    out(4L) shouldBe ((len4, (Q.length + 1).toLong, Some(47L), Some(6L),
      (Q.length + 1).toLong * 1000000L / len4))
    // partition invariance
    SuffixDedup.selfLongestRepeat(
        planted.toDF("doc_id", "text").repartition(1),
        "doc_id", "text", minLen = 20, maxLcp = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      .apply(4L) shouldBe (Q.length + 1).toLong
  }

  test("selfLongestRepeat: a self-repeat LONGER than maxLcp reports the " +
      "cap (lrs_len is a lower bound at the cap value — documented " +
      "contract), and lrs_frac_micros derives from the capped length") {
    val docs = planted.toDF("doc_id", "text")
    // doc 4's true self-repeat is " " + Q = 32 chars; cap at 20
    val out = SuffixDedup.selfLongestRepeat(docs, "doc_id", "text",
        minLen = 20, maxLcp = 20)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(5)))).toMap
    val len4 = planted(3)._2.length.toLong
    out(4L)._1 shouldBe 20L // capped, not 32
    out(4L)._2 shouldBe 20L * 1000000L / len4 // frac is the capped lower bound
  }

  test("collapseExact flood contract: a verbatim-flooded corpus equals " +
      "the operator on the distinct corpus; without the flag the board " +
      "is dominated by trivial whole-doc cross-copy repeats") {
    // 6 verbatim copies of every planted doc; copy 0 keeps the
    // original id, so min-id representatives == the distinct corpus
    val flood = planted.flatMap { case (d, t) =>
      (0 until 6).map(r => (d + 100L * r, t)) }
    val distinctOut = SuffixDedup.longestRepeatedSubstrings(
        planted.toDF("doc_id", "text"), "doc_id", "text",
        minLcp = 20, maxLcp = 128, k = 40)
      .orderBy("rank").collect().map(_.toSeq).toSeq
    val floodOut = SuffixDedup.longestRepeatedSubstrings(
        flood.toDF("doc_id", "text").repartition(4), "doc_id", "text",
        minLcp = 20, maxLcp = 128, k = 40, collapseExact = true)
      .orderBy("rank").collect().map(_.toSeq).toSeq
    floodOut shouldBe distinctOut
    // the regime the contract removes: uncollapsed, the top repeat is
    // a whole doc (>= 80 chars) between verbatim copies, swamping the
    // true 60-char planted board
    val uncollapsed = SuffixDedup.longestRepeatedSubstrings(
        flood.toDF("doc_id", "text"), "doc_id", "text",
        minLcp = 20, maxLcp = 128, k = 1)
      .collect()
    uncollapsed.head.getLong(1) should be >= 80L
  }

  test("scrubRepeatedSubstrings matches a brute-force scrub on the " +
      "random corpus, any partitioning") {
    val rnd = new scala.util.Random(7)
    val vocab = Seq("big", "data", "dedup", "span", "the")
    val docs = (1L to 30L).map(d =>
      (d, (0 until 25).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")))
    val L = 12
    // brute force: canonical = min (doc,pos) per duplicated gram
    val grams = docs.flatMap { case (d, t) =>
      (0 to t.length - L).map(p => (t.substring(p, p + L), d, p + 1)) }
    val byGram = grams.groupBy(_._1).filter(_._2.size >= 2)
    val cut = scala.collection.mutable.Map.empty[Long, Set[Int]].withDefaultValue(Set())
    byGram.foreach { case (_, occ) =>
      val canon = occ.map(g => (g._2, g._3)).min
      occ.filter(g => (g._2, g._3) != canon).foreach { g =>
        cut(g._2) = cut(g._2) ++ (g._3 until (g._3 + L)) }
    }
    val expect = docs.map { case (d, t) =>
      val keep = (1 to t.length).filterNot(cut(d)).map(i => t.charAt(i - 1))
      d -> ((t.length.toLong, cut(d).size.toLong, keep.mkString))
    }.toMap
    for (parts <- Seq(2, 7)) {
      val got = SuffixDedup.scrubRepeatedSubstrings(
          docs.toDF("doc_id", "text").repartition(parts),
          "doc_id", "text", minLen = L)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(3), r.getString(4)))).toMap
      withClue(s"parts=$parts") { got shouldBe expect }
    }
  }
}

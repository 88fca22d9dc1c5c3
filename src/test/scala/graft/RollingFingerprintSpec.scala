package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.TextAnalysis

class RollingFingerprintSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def fp(text: String, k: Int, w: Int): Seq[Long] =
    Seq(Tuple1(text)).toDF("t")
      .select(TextAnalysis.rollingFingerprints(col("t"), k, w).as("f"))
      .head().getSeq[Long](0)

  /** reference implementation: hash every k-gram directly, then
    * window minima — no rolling update, no deque. */
  private def brute(text: String, k: Int, w: Int): Seq[Long] = {
    val cps = text.codePoints().toArray
    if (cps.length < k) return Seq.empty
    val hs = (0 to cps.length - k).map { i =>
      cps.slice(i, i + k).foldLeft(0L)((a, c) => (a * 257 + c) % 1000000007L)
    }
    val win = math.min(w, hs.length)
    (0 to hs.length - win).map(i => hs.slice(i, i + win).min).distinct.sorted
  }

  test("kernel equals the direct per-gram formulation on varied inputs") {
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaa",              // degenerate repeats
      "abcdefgh",                     // exactly k chars -> one gram
      "abcdefg",                      // shorter than k -> empty
      "",                             // empty text
      "ab cd ef gh ij kl mn op qr st" // spaces count as chars
    )
    for (s <- samples) fp(s, 8, 5) shouldBe brute(s, 8, 5)
    // other (k, w) shapes
    fp("hello world hello world", 3, 4) shouldBe brute("hello world hello world", 3, 4)
    fp("hello world", 1, 1) shouldBe brute("hello world", 1, 1)
  }

  test("winnowing guarantee: a shared run of length >= w+k-1 shares a fingerprint") {
    val common = "this exact phrase is long enough to survive winnowing"
    val a = fp("PREFIX_A " + common + " SUFFIX_A", 8, 5).toSet
    val b = fp("completely different opening " + common + " and ending", 8, 5).toSet
    (a intersect b).nonEmpty shouldBe true
    // unrelated texts share nothing
    val c = fp("zzz yyy xxx www vvv uuu ttt sss rrr qqq", 8, 5).toSet
    (a intersect c) shouldBe Set.empty
  }

  test("winnowNearDuplicates: planted near-dups pair up; boilerplate fp suppressed") {
    val boiler = "ubiquitous legal disclaimer footer attached to every single page here"
    val docs = ((1L to 8L).map(i => (i, s"unique body number $i with nothing shared " + boiler)) ++
      Seq(
        (20L, "the same long shared article body about spark engines and planning" + " tail a"),
        (21L, "the same long shared article body about spark engines and planning" + " tail b"),
        (30L, "totally unrelated content that matches nothing else at all in here")))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowNearDuplicates(docs, "doc_id", "text",
        k = 20, w = 12, minShared = 2L, maxDocFreq = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((20L, 21L))
    // the 8 boilerplate docs share ONLY df=8 > 5 fingerprints -> suppressed
    pairs.filter(p => p._1 <= 8L && p._2 <= 8L) shouldBe Set.empty
    pairs.exists(p => p._1 == 30L || p._2 == 30L) shouldBe false
  }

  test("near-duplicates overlap heavily, distinct docs do not") {
    val base = "shared boilerplate sentence that dominates the document body"
    val a = fp(base + " tail one", 8, 5).toSet
    val b = fp(base + " tail two", 8, 5).toSet
    val overlap = (a intersect b).size.toDouble / math.max(a.size, 1)
    overlap should be > 0.5
  }
}

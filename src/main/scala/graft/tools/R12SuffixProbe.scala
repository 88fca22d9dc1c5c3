package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SuffixDedup

/** Round-12 scale probe: the suffix-dedup family (q229-q231) at k×
  * sf0.1 (default 8×), two replication regimes:
  *
  *   - ROTATED: replica i's text passes through an alphabet rotation
  *     by i (injective char map — within-replica duplicate structure
  *     is preserved exactly; cross-replica collisions are limited to
  *     substrings with NO lowercase letter, since only a-z rotates —
  *     negligible here where the corpus is lowercase words, but not
  *     strictly nil for digit/punctuation-only runs), so the
  *     duplicated mass scales ~k× the way independent crawl shards
  *     would. This is the natural-growth row.
  *   - FLOOD: k verbatim copies of every doc (doc_id shifted) — the
  *     adversarial whole-corpus-duplicated regime. Every suffix
  *     passes the seed filter, so this prices the UNFILTERED wide
  *     sort; identical suffixes form runs whose adjacent pairs are
  *     k−1 per run (linear — no quadratic pair blowup by
  *     construction).
  *
  * Per row: best-of-2 walls at 1× and k×, and the wall ratio. */
object R12SuffixProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text"))
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rotated = (0 until k).map { i =>
      val to = alpha.drop(i % 26) + alpha.take(i % 26)
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        translate(col("text"), alpha, to).as("text"))
    }.reduce(_ unionAll _)
    def flood = (0 until k).map(i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        col("text"))).reduce(_ unionAll _)

    val rotDir = s"/tmp/graft_r12_rot_x$k"
    val floodDir = s"/tmp/graft_r12_flood_x$k"
    rotated.write.mode("overwrite").parquet(rotDir)
    flood.write.mode("overwrite").parquet(floodDir)

    def docs(dir: String): DataFrame =
      if (dir == src) base
      else spark.read.parquet(dir).select(col("doc_id"), col("text"))

    def time(name: String, kDir: String)(f: DataFrame => Long): Unit = {
      def once(dir: String): Double = {
        val walls = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); val n = f(docs(dir))
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val (s, n) = walls.minBy(_._1)
        println(f"  $name%-22s ${dir.split('/').last}%-22s $s%7.2f s  rows=$n")
        s
      }
      val t1 = once(src)
      val tk = once(kDir)
      println(f"  $name%-22s scaling: ${tk / t1}%.1fx wall for ${k}x data")
    }

    for (kDir <- Seq(rotDir, floodDir)) {
      println(s"== regime: ${kDir.split('/').last} ==")
      time("q229 suffix LRS", kDir)(d =>
        SuffixDedup.longestRepeatedSubstrings(d, "doc_id", "text",
          minLcp = 40, maxLcp = 640, k = 28).count())
      time("q230 char spans", kDir)(d =>
        SuffixDedup.repeatedCharSpans(d, "doc_id", "text",
          minLen = 25, maxLcp = 128).count())
      time("q231 scrub", kDir)(d =>
        SuffixDedup.scrubRepeatedSubstrings(d, "doc_id", "text",
          minLen = 25).count())
      time("q232 decontaminate", kDir) { d =>
        val isEval = col("doc_id") % 19 === 0
        SuffixDedup.substringContamination(d.filter(!isEval),
          d.filter(isEval), "doc_id", "text", minLen = 30).count()
      }
    }
    // the flood CONTRACT row (round-13): collapseExact composes the
    // exact-dup collapse upstream, so the verbatim-flood regime is
    // structurally removed — expect ~flat wall vs 1x instead of the
    // 34x the unfiltered flood row above prices
    println("== regime: flood + collapseExact (the documented composition) ==")
    time("q229 LRS collapsed", floodDir)(d =>
      SuffixDedup.longestRepeatedSubstrings(d, "doc_id", "text",
        minLcp = 40, maxLcp = 640, k = 28, collapseExact = true).count())
    spark.stop()
  }
}

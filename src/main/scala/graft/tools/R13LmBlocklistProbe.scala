package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Blocklist, TextAnalysis}

/** Round-13 scale probe: Stupid Backoff LM scoring (q243) and the
  * Aho-Corasick blocklist scan (q244) at k× sf0.1 (default 8×,
  * doc_id-shifted replicas). Expected posture:
  *
  *   - blocklist: a pure fused projection — ONE automaton pass per
  *     document, wall linear in corpus bytes, flat per-row cost at
  *     any dictionary size (the probe also runs a 16×-larger
  *     dictionary at 1× to show wall is ~independent of |patterns|).
  *   - stupid backoff: three train-side count aggregates (the count
  *     tables converge to the corpus vocabulary — sublinear growth
  *     under replication since replicas add no new trigrams) + five
  *     keyed joins on pre-aggregated (doc, trigram) rows — wall
  *     tracks the scored-instance count, nothing quadratic. */
object R13LmBlocklistProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text"))
    def repl = (0 until k).map(i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        col("text"))).reduce(_ unionAll _)
    val kDir = s"/tmp/graft_r13_lm_x$k"
    repl.write.mode("overwrite").parquet(kDir)

    def docs(dir: String): DataFrame =
      if (dir == src) base
      else spark.read.parquet(dir).select(col("doc_id"), col("text"))

    def time(name: String)(f: String => Long): Double = {
      def once(dir: String): Double = {
        val walls = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); val n = f(dir)
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val (s, n) = walls.minBy(_._1)
        println(f"  $name%-26s ${dir.split('/').last}%-22s $s%7.2f s  rows=$n")
        s
      }
      val t1 = once(src)
      val tk = once(kDir)
      println(f"  $name%-26s scaling: ${tk / t1}%.1fx wall for ${k}x data")
      t1
    }

    val pats = Seq("slow", "fast table", "merge batch", "a a",
      "click here", "buy now", "winner")
    time("q244 blocklist scan")(d =>
      Blocklist.hitCounts(docs(d), "doc_id", "text", pats).count())

    // dictionary-size independence: 16x the patterns at 1x data —
    // one automaton pass either way, wall should barely move
    val bigPats = pats ++ (for (a <- "abcdefghij"; b <- "klmnopqrstu")
      yield s"$a$b ${a}x$b").take(16 * pats.size - pats.size)
    val bigWall = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      Blocklist.hitCounts(base, "doc_id", "text", bigPats).count()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"  q244 @${bigPats.size} patterns (1x)     $bigWall%7.2f s")

    time("q243 stupid backoff")(d => {
      val dd = docs(d)
      TextAnalysis.stupidBackoffScore(
          dd.filter(col("doc_id") % 10 =!= 0),
          dd.filter(col("doc_id") % 10 === 0), "doc_id", "text")
        .agg(sum(col("logprob_micros"))).head(); 0L
    })

    time("q254 cms backoff")(d => {
      val dd = docs(d)
      TextAnalysis.cmsStupidBackoffScore(
          dd.filter(col("doc_id") % 10 =!= 0),
          dd.filter(col("doc_id") % 10 === 0), "doc_id", "text")
        .agg(sum(col("logprob_micros"))).head(); 0L
    })

    time("q248 dsir weights+topk")(d => {
      val dd = docs(d)
      graft.operators.Curation.gumbelTopK(
          graft.operators.Curation.importanceWeights(
            dd.filter(col("doc_id") % 7 === 0),
            dd.filter(col("doc_id") % 7 =!= 0), "doc_id", "text"),
          "doc_id", k = 100)
        .count()
    })

    // PQ over embeddings: replicate the embeddings table the same way
    val ebase = spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val eKDir = s"/tmp/graft_r13_pq_x$k"
    (0 until k).map(i =>
        ebase.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
          col("embedding"))).reduce(_ unionAll _)
      .write.mode("overwrite").parquet(eKDir)
    def embs(dir: String): org.apache.spark.sql.DataFrame =
      if (dir == src) ebase
      else spark.read.parquet(dir).select(col("vec_id"), col("embedding"))
    def timePq(name: String)(f: String => Long): Unit = {
      def once(dir: String): Double = {
        val walls = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); val n = f(dir)
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val (sWall, n) = walls.minBy(_._1)
        println(f"  $name%-26s ${dir.split('/').last}%-22s $sWall%7.2f s  rows=$n")
        sWall
      }
      val t1 = once(src)
      val tk = once(eKDir)
      println(f"  $name%-26s scaling: ${tk / t1}%.1fx wall for ${k}x data")
    }
    timePq("q256 pq train+adc")(d => {
      val e = embs(d)
      val (codes, books) = graft.operators.Ann.pqTrainEncode(e, "vec_id",
        "embedding", m = 8, subDim = 8, k = 8, iterations = 2, salt = "pq")
      graft.operators.Ann.pqAdcTopK(codes, books,
          e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding",
          m = 8, subDim = 8, topK = 5)
        .count()
    })
    spark.stop()
  }
}

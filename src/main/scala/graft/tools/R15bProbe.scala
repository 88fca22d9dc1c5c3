package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Bitext, Cluster, LateInteraction, TextAnalysis}

/** Round-15b wave scale probe: wall ratios at k× sf0.1 for the
  * session's new surfaces — the corpus-law fits (q297/q300), margin
  * bitext mining (q298), MAUVE frontier (q299), binary Hamming
  * rerank vs the full-vector scan (q301 vs q25's shape), Kneser-Ney
  * scoring (q302), and MaxSim late interaction (q304) — replicating
  * docs/embeddings with distinct ids (the R14Probe discipline).
  * Feeds the PERF.md round-15b table. */
object R15bProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val kDir = s"/tmp/graft_r15b_docs_x$k"
    (0 until k).map(i =>
        base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          col("text"), col("source"))).reduce(_ unionAll _)
      .write.mode("overwrite").parquet(kDir)
    def docs(dir: String): DataFrame =
      if (dir == src) base else spark.read.parquet(dir)

    val ebase = spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val eDir = s"/tmp/graft_r15b_embs_x$k"
    (0 until k).map(i =>
        ebase.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
          col("embedding"))).reduce(_ unionAll _)
      .write.mode("overwrite").parquet(eDir)
    def embs(dir: String): DataFrame =
      if (dir == src) ebase else spark.read.parquet(dir)

    def time(name: String, dirs: Seq[String])(f: String => Long): Unit = {
      val walls = dirs.map { dir =>
        val best = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); val n = f(dir)
          ((System.nanoTime() - t0) / 1e9, n)
        }.minBy(_._1)
        println(f"  $name%-26s ${dir.split('/').last}%-22s ${best._1}%7.2f s  rows=${best._2}")
        best._1
      }
      if (walls.size == 2)
        println(f"  $name%-26s scaling: ${walls(1) / walls(0)}%.1fx wall for ${k}x data")
    }

    time("q297+q300 corpus-law fits", Seq(src, kDir)) { d =>
      TextAnalysis.zipfFit(docs(d), "source", "text").count() +
        TextAnalysis.heapsFit(docs(d), "source", "doc_id", "text").count()
    }

    time("q302 kneser-ney score", Seq(src, kDir)) { d =>
      val dd = docs(d)
      TextAnalysis.kneserNeyScore(dd.filter(col("doc_id") % 10 =!= 0),
        dd.filter(col("doc_id") % 10 === 0), "doc_id", "text").count()
    }

    time("q304 maxsim retrieval", Seq(src, kDir)) { d =>
      val dd = docs(d)
      LateInteraction.maxSimTopK(dd.filter(col("doc_id") % 100 === 0),
        dd.filter(col("doc_id") % 5 === 0), "doc_id", "doc_id", "text",
        maxTokens = 8, dim = 64, k = 3).count()
    }

    // serving regime: FIXED query batch (base ids), corpus grows k×
    time("q304 maxsim fixed-q", Seq(src, kDir)) { d =>
      val dd = docs(d)
      LateInteraction.maxSimTopK(
        dd.filter(col("doc_id") % 100 === 0 && col("doc_id") < 1000000L),
        dd.filter(col("doc_id") % 5 === 0), "doc_id", "doc_id", "text",
        maxTokens = 8, dim = 64, k = 3).count()
    }

    time("q298 margin mining", Seq(src, eDir)) { d =>
      val e = embs(d)
      Bitext.marginMine(e.filter(col("vec_id") % 2 === 0),
        e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
        k = 4).count()
    }

    // serving regime: FIXED X side, Y corpus grows k×
    time("q298 margin fixed-x", Seq(src, eDir)) { d =>
      val e = embs(d)
      Bitext.marginMine(
        e.filter(col("vec_id") % 2 === 0 && col("vec_id") < 1000000L),
        e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
        k = 4).count()
    }

    time("q301 hamming rerank", Seq(src, eDir)) { d =>
      val e = embs(d)
      Ann.hammingRerankTopK(e.filter(col("vec_id") % 50 === 0), e,
        "vec_id", "vec_id", "embedding",
        graft.SparkEntry.hammingPlanes, shortlist = 20, k = 5).count()
    }

    time("q299 mauve frontier", Seq(src, eDir)) { d =>
      val e = spark.read.parquet(
        if (d == src) s"$src/embeddings.parquet" else d)
      val withLabel =
        if (d == src) e
        else e.withColumn("label", (col("vec_id") % 10).cast("int"))
      val asg = Cluster.kmeansMicro(withLabel, "vec_id", "embedding",
        k = 8, iterations = 2, salt = "mauve")
      val flagged = asg.join(withLabel.select(col("vec_id"),
        (col("label") < 5).as("is_p")), "vec_id")
      Cluster.divergenceFrontier(flagged, "cell", "is_p", grid = 8)
        .count()
    }

    spark.stop()
  }
}

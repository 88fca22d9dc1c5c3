package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ann, TextAnalysis, UnigramLm}

/** Round-14 scale probe: trained langid (q263), residual IVF-PQ
  * (q265), and unigram-LM train/encode (q267/q268) at k× sf0.1
  * (default 8×, doc_id/vec_id-shifted replicas). Expected posture:
  *
  *   - langid: per-char md5 bucketing dominates — wall linear in
  *     corpus bytes (prefix-capped at 1024 chars/doc); the model is
  *     a fixed L×1024 aggregate, so train and apply both scale with
  *     the scan, nothing with the model.
  *   - unigram-LM: training operates on the DISTINCT-word table,
  *     which is INVARIANT under replication (Heaps' law regime) —
  *     expect ~flat train wall; encode is a fused projection, linear.
  *   - residual IVF-PQ: corpus grown k×, query set fixed — coarse +
  *     codebook training and the code scan are linear in the corpus;
  *     the ADC lookup table stays |Q|·nProbe·m·k rows regardless. */
object R14Probe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val kDir = s"/tmp/graft_r14_docs_x$k"
    (0 until k).map(i =>
        base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          col("text"), col("lang"))).reduce(_ unionAll _)
      .write.mode("overwrite").parquet(kDir)
    def docs(dir: String): DataFrame =
      if (dir == src) base
      else spark.read.parquet(dir)

    val ebase = spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val eDir = s"/tmp/graft_r14_embs_x$k"
    (0 until k).map(i =>
        ebase.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
          col("embedding"))).reduce(_ unionAll _)
      .write.mode("overwrite").parquet(eDir)

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

    time("q263 langid train+apply", Seq(src, kDir)) { d =>
      val dd = docs(d)
      val model = TextAnalysis.langIdTrain(
        dd.filter(pmod(col("doc_id"), lit(5L)) =!= 0L), "text", "lang")
      TextAnalysis.langIdApply(dd.select(col("doc_id"), col("text")),
        "doc_id", "text", model).count()
    }

    time("q267 unigram train", Seq(src, kDir)) { d =>
      UnigramLm.trainViterbiEm(docs(d), "text", rounds = 2,
        maxPieceLen = 4, vocabCap = 128, maxWordLen = 12).count()
    }

    time("q268 unigram encode", Seq(src, kDir)) { d =>
      val dd = docs(d)
      val vocab = UnigramLm.trainViterbiEm(dd, "text", rounds = 2,
          maxPieceLen = 4, vocabCap = 128, maxWordLen = 12)
        .select(col("piece"), col("w_micros"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      UnigramLm.encodeStats(dd, "doc_id", "text",
        vocab.map(_._1).toSeq, vocab.map(_._2).toSeq,
        maxPieceLen = 4, maxWordLen = 12).count()
    }

    val qset = ebase.filter(col("vec_id") % 50 === 0)
    time("q265 residual ivf-pq", Seq(s"$src/embeddings.parquet", eDir)) { d =>
      val corpus =
        if (d.startsWith(src)) ebase
        else spark.read.parquet(d)
      Ann.ivfPqResidualTopK(qset, corpus, "vec_id", "embedding",
        kCells = 8, coarseIterations = 2, nProbe = 3,
        m = 8, subDim = 8, kCodes = 8, pqIterations = 2, topK = 5).count()
    }

    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Curation, TextAnalysis, UnigramLm}

/** Round-15 wave scale probe: wall ratios at k× sf0.1 for the new
  * surfaces — token-id packing (q275), CCNet bucketing (q281),
  * DoReMi-lite (q286), and the NN-descent graph build+search (q280)
  * — replicating docs/embeddings with distinct ids (the R14Probe
  * discipline; duplicate TEXT is the realistic crawl regime for the
  * text ops, and the graph probe measures the build's n·degree²
  * candidate mass directly). Feeds the PERF.md round-15 table. */
object R15Probe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val kDir = s"/tmp/graft_r15_docs_x$k"
    (0 until k).map(i =>
        base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          col("text"), col("source"))).reduce(_ unionAll _)
      .write.mode("overwrite").parquet(kDir)
    def docs(dir: String): DataFrame =
      if (dir == src) base else spark.read.parquet(dir)

    val ebase = spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val eDir = s"/tmp/graft_r15_embs_x$k"
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

    time("q275 token-id packing", Seq(src, kDir)) { d =>
      val dd = docs(d)
      val vocab = UnigramLm.trainViterbiEm(dd, "text", rounds = 2,
          maxPieceLen = 4, vocabCap = 128, maxWordLen = 12)
        .select(col("piece"), col("w_micros"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      import spark.implicits._
      val pieces = vocab.map(_._1).toSeq
      val tid = pieces.zipWithIndex
        .map { case (p, i) => (p, (i + 1).toLong) }.toDF("piece", "tid")
      val enc = UnigramLm.encodeIds(dd, "doc_id", "text", pieces,
          vocab.map(_._2).toSeq, maxPieceLen = 4, maxWordLen = 12)
        .join(broadcast(tid), Seq("piece"))
        .select(col("doc_id"), lit(0L).as("is_eos"), col("word_pos"),
          col("piece_idx").cast("long").as("piece_idx"), col("tid"))
      val eos = dd.select(col("doc_id"), lit(1L).as("is_eos"),
        lit(0L).as("word_pos"), lit(0L).as("piece_idx"), lit(0L).as("tid"))
      val stream = enc.unionByName(eos).join(
        Curation.deterministicSplit(dd.select(col("doc_id")), "doc_id",
          Seq("train" -> 90, "valid" -> 5, "test" -> 5)), Seq("doc_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("split"))
        .orderBy(col("doc_id"), col("is_eos"), col("word_pos"),
          col("piece_idx"))
      stream.withColumn("__g", row_number().over(w).cast("long"))
        .withColumn("seq_id", expr("(__g - 1) div 512"))
        .groupBy(col("split"), col("seq_id"))
        .agg(count(lit(1)).as("n_tokens"))
        .count()
    }

    time("q281 ppl bucketing", Seq(src, kDir)) { d =>
      val dd = docs(d)
      val hold = Curation.inSample(col("doc_id"), 1, 10, "ppl")
      val scored = TextAnalysis.stupidBackoffScore(
          dd.filter(!hold).select(col("doc_id"), col("text")),
          dd.filter(hold).select(col("doc_id"), col("text")),
          "doc_id", "text")
        .join(dd.select(col("doc_id"), col("source")), Seq("doc_id"))
      TextAnalysis.perplexityBuckets(scored, "source", "doc_id")
        .groupBy(col("source"), col("ppl_bucket"))
        .agg(count(lit(1)).as("n_docs"))
        .count()
    }

    time("q286 doremi 3 rounds", Seq(src, kDir)) { d =>
      val dd = docs(d)
      val hold = Curation.inSample(col("doc_id"), 1, 10, "ppl")
      val perDoc = TextAnalysis.stupidBackoffScore(
          dd.filter(!hold).select(col("doc_id"), col("text")),
          dd.select(col("doc_id"), col("text")), "doc_id", "text")
        .withColumn("nll",
          expr("((-logprob_micros) * 1000L) div n_trigrams"))
        .join(dd.select(col("doc_id"), col("source")), Seq("doc_id"))
      Curation.doremiWeights(perDoc, "source", "doc_id", "nll",
        rounds = 3, etaDen = 2000L).count()
    }

    val qset = ebase.filter(col("vec_id") % 50 === 0)
    time("q280 graph build+search", Seq(s"$src/embeddings.parquet", eDir)) { d =>
      val corpus =
        if (d.startsWith(src)) ebase else spark.read.parquet(d)
      val g = Ann.nnDescentGraph(corpus, "vec_id", "embedding",
        degree = 16, rounds = 2, salt = "nnd")
      Ann.graphBeamTopK(g, qset, corpus, "vec_id", "embedding",
        beam = 16, hops = 4, topK = 5).count()
    }

    spark.stop()
  }
}

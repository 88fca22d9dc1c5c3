package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Curation, Dedup, Graph}

/** Scale-up probe for the round-11c additions (dev tool): replicates
  * the sf0.1 tables K× with re-keyed ids and times sorted-neighbor
  * dedup, A-ES weighted sampling, mutual-kNN k-core, and HITS at 1×
  * and K×. Same method as [[ScaleProbe]]/[[NewOpsProbe]].
  *
  * Expected shapes: SNM ~linear (candidate volume is exactly n·w by
  * construction — the replica flood CANNOT inflate it, unlike an LSH
  * bucket); A-ES ~linear scan with a k-row TakeOrdered; HITS ~linear
  * in edges (K disjoint graph copies). Mutual-kNN's brute-force scan
  * tier is openly quadratic (K² pair work) — the probe records it;
  * the corpus-scale path swaps that tier for IVF candidates (q149)
  * while the reciprocity join and peel stay edge-linear.
  */
object R11cProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val src = "/root/testdata/sf0.1"
    val dst = s"/tmp/graft_r11c_x$k"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(name: String, idSteps: (String, Long)*): DataFrame = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      (0 until k).map(i =>
        idSteps.foldLeft(base) { case (df, (c, step)) =>
          df.withColumn(c, col(c) + lit(i * step))
        }).reduce(_ union _)
    }
    replicate("documents", "doc_id" -> 1000000L)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    replicate("embeddings", "vec_id" -> 1000000L)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    replicate("lineitem", "l_orderkey" -> 100000000L, "l_partkey" -> 10000000L)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")

    def time(name: String)(f: String => Long): Unit = {
      def once(dir: String): Double = {
        val t0 = System.nanoTime(); val n = f(dir)
        val s = (System.nanoTime() - t0) / 1e9
        println(f"  $name%-24s ${dir.split('/').last}%-18s $s%7.2f s  rows=$n")
        s
      }
      val t1 = once(src)
      val tk = once(dst)
      println(f"  $name%-24s scaling: ${tk / t1}%.1fx wall for ${k}x data")
    }

    time("snm_dedup_w4") { dir =>
      Dedup.sortedNeighborPairs(
        spark.read.parquet(s"$dir/documents.parquet"),
        "text", "doc_id", windowSize = 4).count()
    }
    time("aes_sample_k20") { dir =>
      Curation.weightedSampleWithoutReplacement(
        spark.read.parquet(s"$dir/documents.parquet"),
        "doc_id", col("n_chars"), k = 20, salt = "probe").count()
    }
    time("mutual_knn_kcore") { dir =>
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val m = Ann.mutualKnnEdges(e, "vec_id", "v", k = 6)
      Graph.kCore(m, "a", "b", k = 3, maxRounds = 8).count()
    }
    time("hits_3it") { dir =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      val edges = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey").as("src"),
          lead(col("l_partkey"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
      Graph.hits(edges, "src", "dst", iterations = 3, checkpoint = true)
        .count()
    }
    spark.stop()
  }
}

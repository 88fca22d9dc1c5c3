package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage-by-stage timing of the minhash near-dup pipeline (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    time("explode shingles") {
      docs.select(explode(Dedup.shingles(col("text"), 3)).as("sh")).count()
    }
    time("+ md5 + h1/h2") {
      docs.select(explode(Dedup.shingles(col("text"), 3)).as("sh"))
        .select(md5(col("sh")).as("d"))
        .select(conv(substring(col("d"), 1, 14), 16, 10).cast("long").as("h1"))
        .filter(col("h1") > 0).count()
    }
    time("signatures") {
      Dedup.minhashSignatures(docs, "text", "doc_id").count()
    }
    time("candidate pairs") {
      Dedup.minhashCandidatePairs(
        Dedup.minhashSignatures(docs, "text", "doc_id"), "doc_id").count()
    }
    time("full near-dup (jaccard)") {
      Dedup.minhashNearDuplicates(docs, "text", "doc_id",
        jaccardThreshold = 0.8).count()
    }
    spark.stop()
  }
}

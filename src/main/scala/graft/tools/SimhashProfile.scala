package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev tool: stage timing of the simhash near-dup pipeline. */
object SimhashProfile {
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
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    // warm
    docs.count(); Dedup.simhash(docs, "text", "doc_id").count()
    time("explode words") {
      docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), "\\s+"))).as("word")).count()
    }
    time("simhash fingerprints") {
      Dedup.simhash(docs, "text", "doc_id").count()
    }
    val fps = Dedup.simhash(docs, "text", "doc_id").cache()
    fps.count()
    time("join on cached fps") {
      val sliced = fps.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(s => struct(lit(s).as("slice"),
          shiftright(col("simhash"), s * 15).bitwiseAND(0x7fff).as("key"))): _*)).as("sl"))
        .select(col("doc_id"), col("simhash"), col("sl.slice"), col("sl.key"))
      val a = sliced.as("a"); val b = sliced.as("b")
      a.join(b, col("a.slice") === col("b.slice") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          Dedup.hammingDistance(col("a.simhash"), col("b.simhash")).as("hamming"))
        .distinct().filter(col("hamming") <= 8).count()
    }
    time("full pipeline") {
      Dedup.simhashNearDuplicates(docs, "text", "doc_id", 8).count()
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Phase attribution for the q39 incremental-upsert query (dev tool):
  * how much of the wall is fixture staging, how much is the streaming
  * engine + per-batch merges, how much the final readback. */
object ProfileUpsert {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    // warmup: one full run end to end
    graft.SparkEntry.queries("q39_stream_upsert")(spark, sfDir).count()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val work = java.nio.file.Files.createTempDirectory("graft_upsert_prof_").toString
    val staging = s"$work/staging"
    new java.io.File(staging).mkdirs()
    time("stage v0") {
      StreamOps.stageVersionFile(
        docs.select(col("doc_id"), lit(0L).as("version"), col("text")),
        s"$staging/v0.parquet")
    }
    time("stage v1+v2") {
      StreamOps.stageVersionFile(
        docs.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id"), lit(1L).as("version"),
            concat(col("text"), lit(" v1")).as("text")),
        s"$staging/v1.parquet")
      StreamOps.stageVersionFile(
        docs.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), lit(2L).as("version"),
            concat(col("text"), lit(" v2")).as("text")),
        s"$staging/v2.parquet")
    }
    val target = s"$work/target"
    time("stream (3 batches)") {
      StreamOps.embeddingUpsert(spark, staging, target, s"$work/ckpt",
        new graft.embed.HashingEmbedder(dim = 64))
    }
    time("final readback") {
      spark.read.parquet(target)
        .select(col("doc_id"), col("version"),
          md5(col("text")).as("content_md5"),
          size(col("embedding")).cast("long").as("emb_dim"))
        .orderBy("doc_id").count()
    }
    val files = new java.io.File(target).listFiles()
      .filter(_.getName.startsWith("bucket="))
      .map(d => d.listFiles().count(_.getName.endsWith(".parquet"))).sum
    println(s"target parquet files: $files")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.embed.HashingEmbedder
import graft.functions.{GraftUdfs, VectorOps}
import graft.operators.Matcher

object FlagshipStages {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // TypedImperativeAggregate (TopKByScoreAgg) runs on
      // ObjectHashAggregateExec, which falls back to SORT-based
      // aggregation after 128 distinct keys per partition by default —
      // re-introducing exactly the candidate-list sort the aggregate
      // exists to avoid (measured 6x on the flagship at 8x data).
      // States are ~100-byte bounded heaps, so a high threshold is safe.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    val embedder = new HashingEmbedder(dim = 64)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val raw = docs.select(col("source"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 3)).as("raw_input_label"))
      .distinct()
      .withColumn("cleaned_input_label", GraftUdfs.cleanLabel(col("raw_input_label")))
    val queries = embedder.embed(raw, "cleaned_input_label", "qvec")
    val part = spark.read.parquet(s"$sfDir/part.parquet").filter(col("p_partkey") <= 300)
      .select(col("p_partkey").cast("string").as("CT_ID"),
        col("p_name").as("CT_NAME"), col("p_brand").as("CT_LABEL"),
        col("p_type").as("definition"))
      .withColumn("all_text",
        coalesce(concat(col("CT_NAME"), lit(" "), col("CT_LABEL"), lit(" "),
          col("definition")), col("CT_NAME")))
    val ref = Matcher.prepareReference(
      embedder.embed(part, "all_text", "embedding"), "embedding", Seq("CT_ID"))
    Matcher.mapLabels(queries, ref, 2).count() // warm all

    val qNorm = queries.withColumn("q_norm", VectorOps.l2Norm(col("qvec")))
    val scored = qNorm.crossJoin(
        broadcast(ref.select(col("ref_row_id"), col("embedding").as("ref_vec"), col("ref_norm"))))
      .withColumn("score",
        VectorOps.cosineWithNorms(col("qvec"), col("q_norm"), col("ref_vec"), col("ref_norm")))
      .drop("qvec", "q_norm", "ref_vec", "ref_norm")
    time("scored (cross+cos)") { scored.count() }
    val w = Window.partitionBy(col("source"), col("raw_input_label"))
      .orderBy(col("score").desc, col("ref_row_id").asc)
    val topk = scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 2)
    time("topk (window)") { topk.count() }
    val fetched = topk.join(broadcast(ref.select(col("ref_row_id"), col("CT_ID"),
      col("CT_NAME"), col("all_text"))), Seq("ref_row_id"))
    val pivoted = fetched
      .groupBy(col("source"), col("raw_input_label"), col("cleaned_input_label"))
      .pivot("rank", Seq(1: Integer, 2: Integer))
      .agg(first(col("score")), first(col("CT_ID")), first(col("CT_NAME")), first(col("all_text")))
    time("pivoted") { pivoted.count() }
    time("full mapLabels") { Matcher.mapLabels(queries, ref, 2).count() }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.embed.HashingEmbedder
import graft.functions.GraftUdfs
import graft.operators.Matcher

object FlagshipPlan {
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
    val report = Matcher.mapLabels(queries, ref, k = 2)
    println(report.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Window") || l.contains("Sort")
        || l.contains("Join") || l.contains("Aggregate") || l.contains("BatchEvalPython")
        || l.contains("Project") == false && false)
      .mkString("\n"))
    spark.stop()
  }
}

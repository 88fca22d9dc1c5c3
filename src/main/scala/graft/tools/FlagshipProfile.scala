package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.embed.HashingEmbedder
import graft.functions.GraftUdfs
import graft.operators.Matcher

/** Dev tool: stage timing of the flagship label-match report. */
object FlagshipProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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
    val part0 = spark.read.parquet(s"$sfDir/part.parquet")
    docs.count(); part0.count() // warm FS

    def raw = docs.select(col("source"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 3)).as("raw_input_label"))
      .distinct()
      .withColumn("cleaned_input_label", GraftUdfs.cleanLabel(col("raw_input_label")))
    def queries = embedder.embed(raw, "cleaned_input_label", "qvec")
    def part = part0.filter(col("p_partkey") <= 300)
      .select(col("p_partkey").cast("string").as("CT_ID"),
        col("p_name").as("CT_NAME"), col("p_brand").as("CT_LABEL"),
        col("p_type").as("definition"))
      .withColumn("all_text",
        coalesce(concat(col("CT_NAME"), lit(" "), col("CT_LABEL"), lit(" "),
          col("definition")), col("CT_NAME")))
    val ref = Matcher.prepareReference(
      embedder.embed(part, "all_text", "embedding"), "embedding", Seq("CT_ID"))
      .cache()
    // warm whole pipeline once
    Matcher.mapLabels(queries, ref, k = 2).count()

    time("raw distinct+clean") { raw.count() }
    time("queries embedded") { queries.count() }
    time("ref prepared") { ref.count() }
    time("mapLabels full") { Matcher.mapLabels(queries, ref, k = 2).count() }
    spark.stop()
  }
}

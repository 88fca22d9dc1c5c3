package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 stage-level wall breakdown of q229's pipeline at sf0.1 —
  * where do the ~10 s of honest (leak-free) per-invocation cost go?
  * Times each prefix of the suffix pipeline in a fresh run. */
object R13SuffixStageProbe {
  def main(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (20000001L, "alpha head xx alpha tail"),
        (20000002L, "beta intro xx beta ending words"))
        .toDF("doc_id", "text"))
    docs.count() // warm the scan

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"  $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    val minLen = 40; val maxLcp = 640
    val len = length(col("text"))
    val base = docs.filter(len >= minLen)
      .select(col("doc_id").as("__doc"), col("text").as("__t"))
    def gramRows = base
      .select(col("__doc"), col("__t"),
        explode(sequence(lit(1), length(col("__t")) - (minLen - 1)))
          .as("__pos"))
      .select(col("__doc"), col("__pos").cast("long").as("__pos"),
        col("__t").substr(col("__pos"), lit(minLen)).as("__g"))
    time("gram explode")(gramRows.count())
    def dup = gramRows.groupBy(col("__g"))
      .agg(count(lit(1)).as("__c")).filter(col("__c") >= 2).select(col("__g"))
    time("gram explode + dup agg")(dup.count())
    def dupH = gramRows.select(xxhash64(col("__g")).as("__h"))
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("__c")).filter(col("__c") >= 2).select(col("__h"))
    time("gram explode + dup agg (xxhash64)")(dupH.count())
    def survivors = gramRows.join(dup, Seq("__g"), "left_semi")
      .select(col("__doc"), col("__pos"))
    time("+ semi join")(survivors.count())
    def survivorsH = gramRows
      .select(col("__doc"), col("__pos"), xxhash64(col("__g")).as("__h"))
      .join(dupH, Seq("__h"), "left_semi")
      .select(col("__doc"), col("__pos"))
    time("+ semi join (xxhash64)")(survivorsH.count())
    def suff = survivors.join(base, Seq("__doc"))
      .select(col("__doc"), col("__pos"),
        when(col("__pos") === 1, lit(""))
          .otherwise(col("__t").substr(col("__pos") - 1, lit(1))).as("__prev"),
        col("__t").substr(col("__pos"), lit(maxLcp)).as("__pref"))
    time("+ doc join + wide prefix")(suff.count())
    time("full q229 (current code)")(
      graft.operators.SuffixDedup.longestRepeatedSubstrings(
        docs, "doc_id", "text", minLcp = 40, maxLcp = 640, k = 28).count())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-13 plan audit: formatted plans of the new HTML queries. */
object R13Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q235_html_extract", "q237_html_extract_df",
        "q239_outlink_domains")) {
      println(s"===== $q =====")
      graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

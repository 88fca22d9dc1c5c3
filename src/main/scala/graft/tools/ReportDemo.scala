package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.Sinks

/** End-to-end demo of the reference's flagship flow INCLUDING its
  * sink: label-mapping report → single headered CSV
  * (`main.py:215-220`). Run: `sbt "runMain graft.tools.ReportDemo"`. */
object ReportDemo {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/graft_report_demo"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val report = graft.SparkEntry.entry(spark)
    Sinks.reportCsv(report, out)
    val back = spark.read.option("header", "true").csv(out)
    println(s"report rows written: ${back.count()}")
    back.show(5, truncate = 40)
    spark.stop()
  }
}

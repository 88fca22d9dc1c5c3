package graft.tools

import org.apache.spark.sql.SparkSession

/** Shows the plan Bench actually executes: query.count() (dev tool). */
object ExplainCount {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val counted = df.groupBy().count()
    println(counted.queryExecution.executedPlan.treeString.take(3000))
    val t0 = System.nanoTime()
    val n = df.count()
    println(s"count=$n in ${(System.nanoTime() - t0) / 1e9}s")
    spark.stop()
  }
}

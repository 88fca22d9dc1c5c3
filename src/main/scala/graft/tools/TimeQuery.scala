package graft.tools

import org.apache.spark.sql.SparkSession

/** Time ONE SparkEntry query: warmup pass + N timed reps, prints each
  * rep and the min (dev tool — the per-round artifact comes from
  * graft.Bench). Usage: runMain graft.tools.TimeQuery <name> [sfDir] [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).count() // warmup
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"rep $i: $t%7.3f s  rows=$n")
      t
    }
    println(f"min: ${times.min}%7.3f s")
    spark.stop()
  }
}

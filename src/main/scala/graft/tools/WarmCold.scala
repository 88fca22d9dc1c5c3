package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time every SparkEntry query twice in one JVM to separate
  * first-run overhead (FS init, parquet footers, codegen compile, JIT)
  * from steady-state cost. */
object WarmCold {
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
    val cold = graft.SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val warm = graft.SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val w = warm.toMap
    println(f"${"query"}%-26s ${"cold"}%8s ${"warm"}%8s")
    cold.sortBy(-_._2).foreach { case (n, c) =>
      println(f"$n%-26s $c%8.2f ${w(n)}%8.2f")
    }
    println(f"TOTAL cold=${cold.map(_._2).sum}%.1f warm=${warm.map(_._2).sum}%.1f")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Finds which query trips `CodeGenerator: Failed to compile` (the
  * 64KB-method / constant-pool fallback to interpreted mode seen in
  * the round-15 Verify log): runs every query in sorted order with a
  * stdout marker before each, so the ERROR lines in the merged
  * stream attribute to a query. Dev tool. */
object CodegenHunt {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.experimental.extraOptimizations =
      Seq(graft.plans.PushFilterThroughExplode)
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      println(s"### $name")
      Console.out.flush()
      // noop sink, NOT count(): count lets the optimizer prune
      // columns, and the 64KB-method failure lives in the FULL
      // projection's generated aggregate (guide §1.4)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"### $name FAILED: $e") }
    }
    spark.stop()
  }
}

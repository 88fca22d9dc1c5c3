package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-15 optimization plan dumper: writes the formatted physical
  * plan of each named query to `<outDir>/<query>_<suffix>.txt` — the
  * before/after evidence files the optimization round commits under
  * `plans/r15/`. Driver-paced queries (trained models, k-means loops)
  * execute their parameter-sized training while the final frame is
  * built; the dumped plan is the query's RESULT plan, exactly what
  * the bench times end-to-end.
  *
  * Usage: PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.experimental.extraOptimizations =
      Seq(graft.plans.PushFilterThroughExplode)
    Files.createDirectories(Paths.get(outDir))
    for (q <- names) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${q}_$suffix.txt"), plan)
      println(s"dumped $q (${plan.length} chars)")
    }
    spark.stop()
  }
}

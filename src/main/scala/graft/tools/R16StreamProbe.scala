package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-16 probe: A/B `spark.sql.shuffle.partitions` on the
  * streaming replay tier (dev tool). Stateful streaming pins ONE
  * state-store instance per shuffle partition per stateful operator
  * per micro-batch, so a bounded replay over megabytes pays
  * partitions × stores × batches store commits for state that fits
  * in one — the round-15 scaling block measured the tier actively
  * HURT by 32 cores (q72 low/high 0.29, q59 0.32). The conf is read
  * at stream start (fresh temp checkpoint per run), so flipping it
  * between runs in one session is a fair comparison.
  * Usage: runMain graft.tools.R16StreamProbe [sfDir] [q1,q2,...]
  */
object R16StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val queries = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q72_stream_outer_join", "q59_stream_join",
        "q284_stream_graph_serve", "q100_stream_ingest",
        "q47_stream_dedup", "q95_stream_late_data", "q204_stream_cdc",
        "q303_stream_semantic_drift", "q39_stream_upsert",
        "q129_stream_countmin")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup pass (JIT, codegen, staging builds) at the default
    for (q <- queries)
      try graft.SparkEntry.queries(q)(spark, sfDir).count()
      catch { case _: Throwable => () }
    for (parts <- Seq(32, 8, 4, 2, 1); q <- queries) {
      // pin the stream partition count explicitly (the adaptive
      // derivation would otherwise decide for itself)
      spark.conf.set("spark.graft.stream.shufflePartitions", parts.toString)
      val fn = graft.SparkEntry.queries(q)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"  parts=$parts%-3d $q%-28s min=${times.min}%7.2f s")
    }
    spark.stop()
  }
}

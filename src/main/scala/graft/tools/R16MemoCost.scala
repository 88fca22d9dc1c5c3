package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-16 memo-cost transparency probe (round-15 verdict item 8):
  * for the owner query of each board-shared fitted-model/index memo,
  * time the FIRST invocation in a fresh JVM (cold — pays the one-time
  * training/build the memo amortizes) and the best of 3 warm
  * invocations (steady-state serving). cold − warm ≈ the one-time
  * train cost the bench's untimed warmup pass absorbs; PERF.md
  * carries the table so the warmup interaction stays visible.
  * Usage: runMain graft.tools.R16MemoCost [sfDir]
  */
object R16MemoCost {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.experimental.extraOptimizations =
      Seq(graft.plans.PushFilterThroughExplode)
    // one JVM-warmup query that shares NO memo with the probed set,
    // so JIT/codegen/Hadoop init is paid before the first cold timing
    graft.SparkEntry.queries("q09_setops")(spark, sfDir).count()
    val owners = Seq(
      "q263_langid_trained" -> "TextAnalysis.langIdFittedMemo (corpus)",
      "q276_langid_planted" -> "TextAnalysis.langIdFittedMemo (planted)",
      "q154_quality_train" -> "LinearModel.qualityCorpusTrajectory",
      "q267_unigram_train" -> "UnigramLm.trainViterbiEmMemo",
      "q277_unigram_pruned" -> "UnigramLm.trainViterbiEmPrunedMemo",
      "q256_pq_adc_topk" -> "Ann.pqTrainEncodeMemo",
      "q257_ivf_pq_topk" -> "Ann.rawPqIndexMemo",
      "q265_ivf_pq_residual" -> "Ann.residualPqIndexMemo",
      "q278_opq_audit" -> "Ann.opqPqIndexMemo",
      "q280_graph_ann" -> "Ann.nnDescentGraphMemo",
      "q243_stupid_backoff" -> "TextAnalysis.sbCorpusScores")
    println(f"${"query"}%-24s ${"memo"}%-42s cold_s warm_s train_s")
    for ((q, memo) <- owners) {
      val fn = graft.SparkEntry.queries(q)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      val warm = (1 to 3).map { _ =>
        val t = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t) / 1e9
      }.min
      println(f"$q%-24s $memo%-42s $cold%6.2f $warm%6.2f ${cold - warm}%7.2f")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale probe for the batched BPE trainer: rounds-per-driver-action
  * on the REAL documents corpus, plus merge-list equality with the
  * sequential fold — the measurement behind the PERF.md entry.
  *
  * Usage: runMain graft.tools.BpeBatchProbe <sfDir> <iterations> <batch>
  */
object BpeBatchProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, itersS, batchS) = args.take(3)
    val iters = itersS.toInt
    val batch = batchS.toInt
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def run(m: Int, localThreshold: Long = 0L): (Seq[String], Long, Long) = {
      val t0 = System.nanoTime()
      val merges = graft.operators.Bpe
        .trainMerges(docs, "text", iterations = iters, mergesPerAction = m,
          localVocabThreshold = localThreshold)
        .orderBy("iteration").collect()
        .map(r => s"${r.getLong(0)}:${r.getString(1)}+${r.getString(2)}=" +
          s"${r.getLong(4)}@${r.getLong(5)}")
        .toSeq
      val wallMs = (System.nanoTime() - t0) / 1000000
      (merges, graft.operators.Bpe.lastTrainActions.get(), wallMs)
    }
    val (seqM, seqA, seqW) = run(1)
    val (batM, batA, batW) = run(batch)
    val (locM, locA, locW) = run(1, localThreshold = 1000000L)
    println(s"sequential: rounds=${seqM.size} actions=$seqA wall=${seqW}ms")
    println(s"batched($batch): rounds=${batM.size} actions=$batA wall=${batW}ms " +
      f"rounds/action=${batM.size.toDouble / batA}%.2f")
    println(s"driver-local tail: rounds=${locM.size} actions=$locA wall=${locW}ms " +
      f"rounds/action=${locM.size.toDouble / locA}%.2f")
    println(s"merge lists equal: bat=${seqM == batM} local=${seqM == locM}")
    if (seqM != batM || seqM != locM) {
      seqM.zip(batM).zipWithIndex.filter { case ((a, b), _) => a != b }
        .take(5).foreach { case ((a, b), i) => println(s"  DIFF[$i] seq=$a bat=$b") }
      seqM.zip(locM).zipWithIndex.filter { case ((a, b), _) => a != b }
        .take(5).foreach { case ((a, b), i) => println(s"  DIFF[$i] seq=$a loc=$b") }
      sys.exit(1)
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the streaming state-store provider on the heaviest streaming
  * queries (dev tool): HDFS-backed in-memory default vs RocksDB.
  * The conf is read at stream start, so flipping it between runs in
  * one session is a fair comparison. At harness state sizes the
  * expectation is RocksDB LOSES (native column-family setup per
  * store × 32 shuffle partitions × micro-batches dwarfs the tiny
  * state); the probe exists to measure that, not to tune it away —
  * at 100 TB state (billions of dedup keys) the memory-bound default
  * is the one that falls over.
  * Usage: runMain graft.tools.StateStoreProbe [sfDir]
  */
object StateStoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val queries = Seq("q72_stream_outer_join", "q59_stream_join",
      "q100_stream_ingest", "q47_stream_dedup")
    val order = if (args.length > 1 && args(1) == "reverse")
      Seq("rocksdb", "default") else Seq("default", "rocksdb")
    for (q <- queries; provider <- order) {
      if (provider == "rocksdb")
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocks)
      else
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      val fn = graft.SparkEntry.queries(q)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"  $q%-24s $provider%-8s $t%7.2f s  rows=$n")
    }
    spark.stop()
  }
}

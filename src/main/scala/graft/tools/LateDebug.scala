package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Dev probe: per-batch watermark + dropped-row accounting for the
  * q95 late-data staging (prints every StreamingQueryProgress). */
object LateDebug {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import F._
    val staging = java.nio.file.Files.createTempDirectory("late_dbg_").toString
    val ev = graft.sources.EventsLoader.events(spark, dir)
      .select(col("event_id"), col("ts"), col("event_type"))
    val b = ev.agg(min(unix_micros(col("ts"))).as("mn"), max(unix_micros(col("ts"))).as("mx")).head()
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    println(s"mn=$mn mx=$mx expect_wm=${(mx / 1000) * 1000 - 600000000}")
    val isLate = col("event_id") % 11 === 0 && unix_micros(col("ts")) < lit(mn + (mx - mn) / 2)
    graft.streaming.StreamOps.stageVersionFile(ev.filter(!isLate), s"$staging/f0.parquet")
    graft.streaming.StreamOps.stageVersionFile(ev.filter(isLate), s"$staging/f1.parquet")
    val src = spark.readStream
      .schema(StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("event_type", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$staging/*.parquet")
    val q = src
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n_events"))
      .writeStream.format("memory").queryName("late_dbg")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      val drop = p.stateOperators.headOption.map(_.numRowsDroppedByWatermark).getOrElse(-1L)
      println(s"batch=${p.batchId} inRows=${p.numInputRows} wm=${p.eventTime.get("watermark")} " +
        s"maxEt=${p.eventTime.get("max")} dropped=$drop " +
        s"outRows=${p.sink.numOutputRows}")
    }
    println("total_out=" + spark.table("late_dbg").count())
    spark.stop()
  }
}

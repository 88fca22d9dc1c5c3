package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamOps

/** Minimal repro harness for the MemoryStream hang (dev tool). */
object StreamDebug {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "map"
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def stamp(msg: String): Unit =
      println(s"[debug ${System.currentTimeMillis() % 100000}] $msg")

    mode match {
      case "map" =>
        val in = MemoryStream[Long]
        val q = in.toDS().map(_ * 2)
          .writeStream.format("memory").queryName("dbg_map").start()
        stamp("started map query")
        in.addData(1L, 2L, 3L)
        q.processAllAvailable()
        stamp(s"map done: ${spark.table("dbg_map").count()} rows")
        q.stop()
      case "state" =>
        val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
        val q = StreamOps.sessionizeStream(in.toDS().toDF("user_id", "ts", "value"), 30)
          .writeStream.format("memory").queryName("dbg_state").start()
        stamp("started stateful query")
        in.addData((1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), 1.0))
        q.processAllAvailable()
        stamp(s"state batch 1 done: ${spark.table("dbg_state").count()} rows")
        q.stop()
      case "state3" =>
        import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
        import org.apache.spark.sql.functions._
        val in = MemoryStream[(Long, java.sql.Timestamp)]
        val withWm = in.toDS().toDF("user_id", "ts")
          .withWatermark("ts", "10 minutes")
          .as[(Long, java.sql.Timestamp)]
        val q = withWm
          .groupByKey(_._1)
          .flatMapGroupsWithState[Long, (Long, Long)](
            OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
            (k: Long, rows: Iterator[(Long, java.sql.Timestamp)], st: GroupState[Long]) =>
              if (st.hasTimedOut) { val n = st.get; st.remove(); Iterator.single((k, n)) }
              else {
                val n = st.getOption.getOrElse(0L) + rows.size
                st.update(n)
                st.setTimeoutTimestamp(st.getCurrentWatermarkMs() + 60000L)
                Iterator.empty
              }
          }
          .writeStream.format("memory").queryName("dbg_state3")
          .outputMode("append").start()
        stamp("started EventTimeTimeout stateful query")
        in.addData((1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")))
        q.processAllAvailable()
        stamp(s"state3 batch1 done: ${spark.table("dbg_state3").count()} rows")
        in.addData((2L, java.sql.Timestamp.valueOf("2026-01-01 11:00:00")))
        q.processAllAvailable()
        stamp(s"state3 batch2 done: ${spark.table("dbg_state3").count()} rows")
        q.stop()
      case "state2" =>
        import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
        val in = MemoryStream[Long]
        val counted = in.toDS()
          .groupByKey(identity)
          .flatMapGroupsWithState[Long, (Long, Long)](
            OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
            (k: Long, rows: Iterator[Long], st: GroupState[Long]) =>
              val n = st.getOption.getOrElse(0L) + rows.size
              st.update(n)
              Iterator.single((k, n))
          }
        val q = counted.writeStream.format("memory").queryName("dbg_state2")
          .outputMode("append").start()
        stamp("started NoTimeout stateful query")
        in.addData(1L, 1L, 2L)
        q.processAllAvailable()
        stamp(s"state2 done: ${spark.table("dbg_state2").count()} rows")
        q.stop()
    }
    spark.stop()
  }
}

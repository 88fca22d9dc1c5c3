package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

import graft.sources.EventsLoader

/** Loader contract: the events `ts` column must decode to the SAME
  * instants whichever parquet encoding a testdata regeneration ships —
  * the round-8 incident was a silent 1000× time compression (micros
  * read as "nanos") that produced wrong answers with exit 0; only the
  * oracle caught it. Three fixtures, one per encoding the loader can
  * meet:
  *
  *  - NTZ micros (`TIMESTAMP(MICROS, isAdjustedToUTC=false)`) — what
  *    the current testdata writes;
  *  - LTZ micros (`isAdjustedToUTC=true`) — what this engine's own
  *    staged files carry;
  *  - raw long nanos — what `TIMESTAMP(NANOS)` arrives as under the
  *    legacy nanosAsLong flag (indistinguishable from a plain INT64
  *    column at read time, so a long column IS that fixture).
  */
class EventsLoaderSpec extends SparkSpec with Matchers {
  import spark.implicits._

  // a deliberately awkward instant set: epoch-adjacent, sub-second
  // precision, and a 30-day spread like the real events table
  private val micros = Seq(
    1704067798778549L, 1704068166738090L, 1706657176220708L, 1000001L)

  private def writeFixture(kind: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"evts_$kind").toString
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong, "click", 1.5, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val withTs = kind match {
      case "ntz_micros" =>
        // session tz is UTC, so the LTZ->NTZ cast preserves the digits
        base.withColumn("ts", expr("cast(timestamp_micros(us) as timestamp_ntz)"))
      case "ltz_micros" =>
        base.withColumn("ts", expr("timestamp_micros(us)"))
      case "long_nanos" =>
        base.withColumn("ts", col("us") * 1000L)
    }
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val encodings = Seq("ntz_micros", "ltz_micros", "long_nanos")

  test("batch loader decodes identical instants from every ts encoding") {
    encodings.foreach { kind =>
      val dir = writeFixture(kind)
      val out = EventsLoader.events(spark, dir)
      out.schema("ts").dataType shouldBe TimestampType
      val got = out.select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = micros.zipWithIndex.map { case (us, i) => i.toLong -> us }.toMap
      withClue(s"encoding=$kind: ") { got shouldBe want }
    }
  }

  test("streaming loader decodes identical instants from every ts encoding") {
    encodings.foreach { kind =>
      val dir = writeFixture(kind)
      val name = s"evload_${kind}"
      val q = EventsLoader.eventsStream(spark, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .writeStream.format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = spark.table(name)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = micros.zipWithIndex.map { case (us, i) => i.toLong -> us }.toMap
      withClue(s"encoding=$kind: ") { got shouldBe want }
    }
  }

  test("a TRUE parquet TIMESTAMP(NANOS) file (the round-8 incident encoding, " +
      "checked-in pyarrow fixture) decodes through the nanosAsLong path") {
    // the long-nanos fixture above only simulates what the flag
    // DELIVERS; this one exercises the flag itself — without
    // nanosAsLong a TIMESTAMP(NANOS) footer fails schema inference
    val res = getClass.getResource("/graft/events_nanos.parquet")
    res should not be null
    val dir = java.nio.file.Files.createTempDirectory("evts_realnanos").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(res.toURI),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    Seq(
      EventsLoader.events(spark, dir),
      {
        val name = "evload_realnanos"
        val q = EventsLoader.eventsStream(spark, dir)
          .writeStream.format("memory").queryName(name)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        spark.table(name)
      }).foreach { out =>
      out.schema("ts").dataType shouldBe TimestampType
      val got = out.select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got shouldBe micros.zipWithIndex.map { case (us, i) => i.toLong -> us }.toMap
    }
  }

  test("the real testdata decodes to the 2024-01 30-day event range, not 43 minutes") {
    val ev = EventsLoader.events(spark, "/root/testdata/sf0.001")
    val r = ev.agg(min(unix_micros(col("ts"))).as("mn"),
        max(unix_micros(col("ts"))).as("mx")).head()
    val spanDays = (r.getLong(1) - r.getLong(0)) / 86400000000.0
    // the r8 bug collapsed this span 1000x (to ~43 min = 0.03 days)
    spanDays should be > 25.0
    spanDays should be < 45.0
  }
}

package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-adaptive reader for the `events` table.
  *
  * The testdata's `ts` column has been written under TWO parquet
  * encodings across regenerations:
  *
  *  - `TIMESTAMP(NANOS)` — Spark cannot decode nanos natively; with
  *    `spark.sql.legacy.parquet.nanosAsLong` the column arrives as a
  *    raw `LongType` of nanos-since-epoch;
  *  - `TIMESTAMP(MICROS, isAdjustedToUTC=false)` — Spark infers
  *    `TIMESTAMP_NTZ`, but a schema-override read requesting plain
  *    `TimestampType` decodes the stored micros directly as
  *    micros-since-epoch (no timezone math anywhere in the reader),
  *    which is exactly how DuckDB's `epoch_us(ts)` oracle reads the
  *    same file.
  *
  * Hard-coding either assumption poisons the other encoding — the
  * round-8 regression read micros as "nanos" and compressed the
  * 30-day event range into 43 minutes of wrong-but-exit-0 output. So
  * every events read (batch AND streaming, which needs an explicit
  * schema anyway) goes through here: probe the file's footer once per
  * directory, pick the decode path from what the footer says, and
  * hand back `ts` as a proper `TimestampType` in both cases.
  * EventsLoaderSpec pins both encodings against fixtures.
  */
object EventsLoader {

  /** Footer-derived schema per (path, mtime) — the probe is one
    * driver-side footer read; memoized so bench reps don't repeat it.
    * The mtime in the key means an in-place testdata regeneration
    * (which has already flipped the ts encoding once) re-probes
    * instead of driving the stale decode branch. The mtime is the
    * NEWEST entry under the path, not the directory's own: rewriting
    * part files in place need not bump the directory mtime, and a
    * long-lived JVM would otherwise keep the stale branch. */
  private val schemaCache =
    new ConcurrentHashMap[(String, Long), StructType]()

  private def mtimeOf(path: String): Long = {
    def m(p: java.nio.file.Path): Long =
      try java.nio.file.Files.getLastModifiedTime(p).toMillis
      catch {
        case _: java.io.IOException          => 0L
        case _: java.io.UncheckedIOException => 0L
      }
    val p = java.nio.file.Paths.get(path)
    val self = m(p)
    if (!java.nio.file.Files.isDirectory(p)) self
    else {
      // the listing itself can race an in-place regeneration (dir
      // deleted between the isDirectory check and list) — degrade to
      // the directory's own mtime like the per-entry probe does
      try {
        val s = java.nio.file.Files.list(p)
        try s.mapToLong(c => m(c)).reduce(self, (a: Long, b: Long) => math.max(a, b))
        finally s.close()
      } catch {
        // the terminal reduce surfaces mid-listing deletion as
        // UncheckedIOException (wrapping NoSuchFileException) or
        // DirectoryIteratorException, not plain IOException
        case _: java.io.IOException                       => self
        case _: java.io.UncheckedIOException              => self
        case _: java.nio.file.DirectoryIteratorException  => self
      }
    }
  }

  private def rawSchema(spark: SparkSession, path: String): StructType = {
    // set on EVERY call, not just the memoized probe: the cache is
    // JVM-global while the flag is per-session, and without it a
    // TIMESTAMP(NANOS) footer fails schema inference outright (with
    // it, nanos arrive as LongType; micros/NTZ are unaffected)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schemaCache.computeIfAbsent((path, mtimeOf(path)), { _ =>
      spark.read.parquet(path).schema
    })
  }

  /** True when the file stores `ts` as raw nanos-since-epoch longs
    * (the legacy `TIMESTAMP(NANOS)` encoding under the nanosAsLong
    * flag — or literally an INT64 column, which decodes the same). */
  private def tsIsLegacyNanos(schema: StructType): Boolean =
    schema("ts").dataType == LongType

  /** The probe schema with `ts` re-typed to plain `TimestampType`:
    * the schema-override request that makes the parquet reader decode
    * stored micros as micros-since-epoch with no timezone adjustment. */
  private def tsAsTimestampSchema(schema: StructType): StructType =
    StructType(schema.map { f =>
      if (f.name == "ts") f.copy(dataType = TimestampType) else f
    })

  /** Batch read of `$dir/events.parquet` with `ts` normalized to
    * `TimestampType` (micros precision), whatever the file encoding. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val raw = rawSchema(spark, path)
    if (tsIsLegacyNanos(raw))
      spark.read.parquet(path)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else
      spark.read.schema(tsAsTimestampSchema(raw)).parquet(path)
  }

  /** Streaming read of the events table, same normalization contract
    * as [[events]] (FileStreamSource requires an explicit schema, so
    * the footer probe supplies it). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val raw = rawSchema(spark, path)
    // glob form: FileStreamSource requires its basePath (the glob's
    // parent) to be a directory — a bare file path is rejected
    val glob = s"$dir/{events}.parquet"
    if (tsIsLegacyNanos(raw))
      spark.readStream.schema(raw).parquet(glob)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else
      spark.readStream.schema(tsAsTimestampSchema(raw)).parquet(glob)
  }

}

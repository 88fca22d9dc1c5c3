package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container source/sink — the one common pipeline interchange
  * format the engine's sink family (CSV / JSON-L / Parquet / ORC,
  * [[Sinks]]; round-12 §2.1 rows) did not yet cover. The sandbox
  * ships Avro CORE jars (`avro-1.12.1` + `avro-mapred`'s `FsInput`)
  * but not the `spark-avro` module, so `df.write.format("avro")` is
  * unavailable; this implements the container read/write directly on
  * the public Avro API through the Hadoop FS layer — which is also
  * the honest 100 TB shape: one container file per partition on
  * write, one partition per container file on read, no driver-side
  * data movement in either direction (only the schema is read on
  * the driver).
  *
  * Type mapping (both directions, nullables as `union(null, T)`):
  * long/int/double/float/boolean/string/binary, `timestamp-micros`
  * for TimestampType, `date` for DateType, and arrays of any
  * supported element. Schema is carried inside every container file
  * (Avro's self-describing contract), so the reader infers the
  * StructType from the first file and needs no side-channel.
  *
  * Not a DataSourceV2: no predicate pushdown (Avro is row-major —
  * a scan reads whole records regardless; column pruning after read
  * is a projection Catalyst collapses). The spec pins the round-trip
  * type preservation instead.
  */
object AvroIo {

  /** Hadoop Configuration is not java-Serializable; the standard
    * wrapper (write/readFields through the object stream) — Spark's
    * own is `private[spark]`. */
  private class SerConf(@transient private var c: Configuration)
      extends Serializable {
    def value: Configuration = c
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject(); c.write(out)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject(); c = new Configuration(false); c.readFields(in)
    }
  }

  private[sources] def toAvroSchema(st: StructType, record: String): Schema = {
    val fields = SchemaBuilder.record(record).namespace("graft").fields()
    st.fields.foldLeft(fields) { (fs, f) =>
      val base = fieldSchema(f.dataType)
      if (f.nullable)
        fs.name(f.name).`type`(Schema.createUnion(
          java.util.List.of(Schema.create(Schema.Type.NULL), base)))
          .withDefault(null)
      else fs.name(f.name).`type`(base).noDefault()
    }.endRecord()
  }

  private def fieldSchema(dt: DataType): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case ArrayType(elem, containsNull) =>
      val e = fieldSchema(elem)
      Schema.createArray(if (containsNull) Schema.createUnion(
        java.util.List.of(Schema.create(Schema.Type.NULL), e)) else e)
    case other =>
      throw new IllegalArgumentException(s"AvroIo: unsupported type $other")
  }

  private def fromAvroSchema(s: Schema): StructType =
    StructType(s.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = fieldType(f.schema())
      StructField(f.name(), dt, nullable)
    })

  private def fieldType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"AvroIo: unsupported union $s")
      (fieldType(nonNull.head)._1, true)
    case Schema.Type.LONG =>
      val dt = if (s.getLogicalType != null &&
        s.getLogicalType.getName == "timestamp-micros") TimestampType
      else LongType
      (dt, false)
    case Schema.Type.INT =>
      val dt = if (s.getLogicalType != null &&
        s.getLogicalType.getName == "date") DateType
      else IntegerType
      (dt, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case Schema.Type.ARRAY =>
      val (edt, en) = fieldType(s.getElementType)
      (ArrayType(edt, containsNull = en), false)
    case other =>
      throw new IllegalArgumentException(s"AvroIo: unsupported avro type $other")
  }

  private def toAvroValue(v: Any, dt: DataType, s: Schema): AnyRef = {
    if (v == null) return null
    val elemSchema = if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else s
    (dt, v) match {
      case (TimestampType, t: java.sql.Timestamp) =>
        java.lang.Long.valueOf(t.getTime * 1000L + (t.getNanos / 1000) % 1000)
      case (TimestampType, t: java.time.Instant) =>
        java.lang.Long.valueOf(t.getEpochSecond * 1000000L + t.getNano / 1000)
      case (DateType, d: java.sql.Date) =>
        java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
      case (DateType, d: java.time.LocalDate) =>
        java.lang.Integer.valueOf(d.toEpochDay.toInt)
      case (BinaryType, b: Array[Byte]) => ByteBuffer.wrap(b)
      case (ArrayType(edt, _), seq: scala.collection.Seq[_]) =>
        val es = elemSchema.getElementType
        val out = new java.util.ArrayList[AnyRef](seq.length)
        seq.foreach(e => out.add(toAvroValue(e, edt, es)))
        out
      case (_, other) => other.asInstanceOf[AnyRef]
    }
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = {
    if (v == null) return null
    dt match {
      case StringType => v.toString
      case TimestampType =>
        val micros = v.asInstanceOf[java.lang.Long].longValue()
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L))
      case DateType =>
        java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue()))
      case BinaryType =>
        val bb = v.asInstanceOf[ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
      case ArrayType(edt, _) =>
        v.asInstanceOf[java.util.List[_]].asScala.toSeq
          .map(fromAvroValue(_, edt))
      case FloatType => v.asInstanceOf[java.lang.Float].floatValue()
      case _ => v
    }
  }

  /** Write `df` as one Avro container file per partition under
    * `path` (created/overwritten). Empty partitions still write a
    * schema-only container, so the directory is never schema-less. */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val conf = new SerConf(spark.sparkContext.hadoopConfiguration)
    val schemaJson = toAvroSchema(df.schema, "row").toString
    val sparkSchema = df.schema
    val fs = FileSystem.get(new java.net.URI(path), conf.value)
    val dir = new Path(path)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val file = new Path(path, f"part-$pid%05d.avro")
      val out = FileSystem.get(file.toUri, conf.value).create(file, true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.create(schema, out)
      var n = 0L
      rows.foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < sparkSchema.length) {
          val f = sparkSchema(i)
          rec.put(f.name, toAvroValue(row.get(i), f.dataType,
            schema.getField(f.name).schema()))
          i += 1
        }
        writer.append(rec); n += 1L
      }
      writer.close()
      Iterator.single(n)
    }.count() // one action materializes every partition file
    ()
  }

  /** Read an [[write]]-produced directory (or any directory of Avro
    * container files with a uniform schema): StructType inferred
    * from the first file's embedded schema, then one partition per
    * file — each executor opens only its own containers. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = new SerConf(spark.sparkContext.hadoopConfiguration)
    val fs = FileSystem.get(new java.net.URI(path), conf.value)
    val files = fs.globStatus(new Path(path, "*.avro"))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"AvroIo.read: no .avro files under $path")
    val first = new DataFileReader[GenericRecord](
      new FsInput(new Path(files.head), conf.value),
      new GenericDatumReader[GenericRecord]())
    val avroSchema = first.getSchema
    first.close()
    val sparkSchema = fromAvroSchema(avroSchema)
    val rows = spark.sparkContext
      .parallelize(files.toIndexedSeq, files.length)
      .flatMap { f =>
        val reader = new DataFileReader[GenericRecord](
          new FsInput(new Path(f), conf.value),
          new GenericDatumReader[GenericRecord]())
        val it: Iterator[Row] = reader.iterator().asScala.map { rec =>
          Row.fromSeq(sparkSchema.fields.toSeq.map(fld =>
            fromAvroValue(rec.get(fld.name), fld.dataType)))
        }
        new Iterator[Row] { // close the container at exhaustion
          def hasNext: Boolean = {
            val h = it.hasNext; if (!h) reader.close(); h
          }
          def next(): Row = it.next()
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}

package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

import graft.sources.AvroIo

class AvroIoSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    new java.io.File(d, "data").getAbsolutePath
  }

  test("round-trip preserves every supported type, nullability, and values") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", IntegerType, nullable = true),
      StructField("x", DoubleType, nullable = true),
      StructField("f", FloatType, nullable = true),
      StructField("ok", BooleanType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("b", BinaryType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("d", DateType, nullable = true),
      StructField("vec", ArrayType(DoubleType, containsNull = false),
        nullable = true),
      StructField("words", ArrayType(StringType, containsNull = true),
        nullable = true)))
    val rows = Seq(
      Row(1L, 7, 2.5, 1.5f, true, "alpha", Array[Byte](1, 2, 3),
        Timestamp.valueOf("2026-03-01 12:34:56.789012"),
        Date.valueOf("2026-03-01"), Seq(1.0, 2.0), Seq("a", null, "c")),
      Row(2L, null, null, null, null, null, null, null, null, null, null),
      Row(3L, -4, -0.125, -2.25f, false, "", Array.empty[Byte],
        Timestamp.valueOf("1969-12-31 23:59:59.000001"),
        Date.valueOf("1969-12-31"), Seq.empty[Double], Seq.empty[String]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmpDir("avro_rt")
    AvroIo.write(df, dir)
    val back = AvroIo.read(spark, dir)
    back.schema.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq shouldBe
      schema.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq
    val a = df.orderBy("id").collect()
    val b = back.orderBy("id").collect()
    b.length shouldBe 3
    a.zip(b).foreach { case (x, y) =>
      x.toSeq.zip(y.toSeq).zipWithIndex.foreach {
        case ((xa: Array[Byte], ya: Array[Byte]), _) =>
          ya.toSeq shouldBe xa.toSeq
        case ((xv, yv), i) =>
          withClue(s"field ${schema(i).name}") { yv shouldBe xv }
      }
    }
  }

  test("timestamp survives at microsecond precision (timestamp-micros)") {
    val t = Timestamp.valueOf("2026-08-15 01:02:03.123456")
    val dir = tmpDir("avro_ts")
    AvroIo.write(Seq(Tuple1(t)).toDF("ts"), dir)
    AvroIo.read(spark, dir).head().getTimestamp(0) shouldBe t
  }

  test("empty partitions still write schema-bearing containers; an " +
      "all-empty dataset reads back as 0 rows WITH its schema") {
    val df = spark.range(0).select(col("id"),
      concat(lit("s"), col("id")).as("s"))
    val dir = tmpDir("avro_empty")
    AvroIo.write(df.repartition(3), dir)
    val back = AvroIo.read(spark, dir)
    back.count() shouldBe 0L
    back.schema.fieldNames.toSeq shouldBe Seq("id", "s")
  }

  test("one container file per partition; read runs one partition per file") {
    val dir = tmpDir("avro_parts")
    AvroIo.write(spark.range(100).repartition(5).toDF(), dir)
    new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".avro")) shouldBe 5
    val back = AvroIo.read(spark, dir)
    back.rdd.getNumPartitions shouldBe 5
    back.agg(sum("id")).head().getLong(0) shouldBe (0L until 100L).sum
  }

  test("round-trips a real testdata table byte-for-byte (documents)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmpDir("avro_docs")
    AvroIo.write(docs, dir)
    val back = AvroIo.read(spark, dir)
    back.count() shouldBe docs.count()
    // full-column md5 content digest equality, order-free
    def digest(df: org.apache.spark.sql.DataFrame): String =
      df.select(md5(to_json(struct(df.columns.sorted.map(col).toSeq: _*)))
          .as("h"))
        .agg(sum(conv(substring(col("h"), 1, 8), 16, 10).cast("long")))
        .head().getLong(0).toString
    digest(back) shouldBe digest(docs)
  }

  test("overwrite semantics: writing again replaces prior contents") {
    val dir = tmpDir("avro_ow")
    AvroIo.write(spark.range(10).toDF(), dir)
    AvroIo.write(spark.range(3).toDF(), dir)
    AvroIo.read(spark, dir).count() shouldBe 3L
  }
}

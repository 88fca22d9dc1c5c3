package graft

import java.nio.file.Files

import org.scalatest.matchers.should.Matchers

import graft.sources.Sinks

class SinksSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("reportCsv writes exactly one headered part file that round-trips") {
    val dir = Files.createTempDirectory("sinks").toFile
    val path = new java.io.File(dir, "report").getAbsolutePath
    val df = Seq(("a", 1), ("b", 2)).toDF("label", "n")
    Sinks.reportCsv(df, path)
    val parts = new java.io.File(path).listFiles().filter(_.getName.endsWith(".csv"))
    parts should have length 1
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    back.collect().map(r => (r.getString(0), r.getInt(1))).toSet shouldBe
      Set(("a", 1), ("b", 2))
  }

  test("co-bucketed tables join and aggregate with zero exchanges") {
    val docs = (0L until 100L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val meta = (0L until 100L).map(i => (i, i % 7)).toDF("doc_id", "grp")
    Sinks.bucketedParquetTable(docs, "graft_bkt_docs", "doc_id", 4)
    Sinks.bucketedParquetTable(meta, "graft_bkt_meta", "doc_id", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkt_docs")
        .join(spark.table("graft_bkt_meta"), "doc_id")
      joined.count() shouldBe 100L
      val joinPlan = joined.queryExecution.executedPlan.toString
      joinPlan should not include "Exchange"
      // aggregation on the bucket key is exchange-free too
      val agg = spark.table("graft_bkt_docs").groupBy("doc_id").count()
      agg.count() shouldBe 100L
      agg.queryExecution.executedPlan.toString should not include "Exchange"
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_docs")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_meta")
    }
  }

  test("bulkCsv preserves partition parallelism") {
    val dir = Files.createTempDirectory("sinks").toFile
    val path = new java.io.File(dir, "bulk").getAbsolutePath
    Sinks.bulkCsv(spark.range(100).repartition(4).toDF("id"), path)
    val parts = new java.io.File(path).listFiles().filter(_.getName.endsWith(".csv"))
    parts.length shouldBe 4
    spark.read.option("header", "true").csv(path).count() shouldBe 100L
  }

  test("partitionedParquet: a partition-column filter prunes to matching dirs") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("sinks").toFile
    val path = new java.io.File(dir, "bylang").getAbsolutePath
    val docs = spark.range(0, 300).select(
      col("id").as("doc_id"),
      element_at(array(lit("en"), lit("de"), lit("fr")),
        (col("id") % 3 + 1).cast("int")).as("lang"))
    Sinks.partitionedParquet(docs, path, Seq("lang"), Seq("doc_id"))

    // three lang=... directories on disk
    new java.io.File(path).listFiles()
      .count(_.getName.startsWith("lang=")) shouldBe 3

    val filtered = spark.read.parquet(path).filter(col("lang") === "en")
    filtered.count() shouldBe 100L
    val scans = filtered.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    scans should have size 1
    // pruning happened at planning: only the lang=en partition is read
    scans.head.selectedPartitions.partitionCount shouldBe 1
  }

  test("schema drift: mergeSchema unifies parquet files written with evolving columns") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("sinks").toFile
    val path = new java.io.File(dir, "evolving").getAbsolutePath
    // v1 writer: (doc_id, text); v2 adds a lang column
    Seq((1L, "a")).toDF("doc_id", "text")
      .write.parquet(s"$path/batch=1")
    Seq((2L, "b", "en")).toDF("doc_id", "text", "lang")
      .write.parquet(s"$path/batch=2")
    val unified = spark.read.option("mergeSchema", "true").parquet(path)
      .orderBy("doc_id").collect()
    unified.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L)
    // old rows surface the new column as null — the ingest contract
    // for evolving crawl schemas
    unified(0).getAs[String]("lang") shouldBe null
    unified(1).getAs[String]("lang") shouldBe "en"
  }

  test("orc: round trip preserves types; predicate pushes to the scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("sinks").toFile
    val path = new java.io.File(dir, "docs.orc").getAbsolutePath
    val docs = (1L to 500L).map(i => (i, s"text $i", i * 1.5))
      .toDF("doc_id", "text", "score")
    Sinks.orc(docs, path)
    val back = Sinks.readOrc(spark, path)
    back.schema.map(_.dataType.typeName).toSeq shouldBe
      Seq("long", "string", "double")
    val filtered = back.filter(col("doc_id") === 42L)
    filtered.collect().map(r => (r.getLong(0), r.getString(1))) shouldBe
      Array((42L, "text 42"))
    val scan = filtered.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    // the equality predicate reached the ORC reader's pushdown slot
    scan.metadata("PushedFilters") should include ("doc_id")
  }

  test("jsonl: gzip round trip with explicit schema; corrupt lines quarantine") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = Files.createTempDirectory("sinks").toFile
    val path = new java.io.File(dir, "corpus.jsonl").getAbsolutePath
    val docs = Seq((1L, "alpha text", "src0"), (2L, "beta", "src1"))
      .toDF("doc_id", "text", "source")
    Sinks.jsonl(docs, path)
    // gzip part files on disk
    new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".json.gz")) should be >= 1
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType)))
    val back = Sinks.readJsonl(spark, path, schema)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    back shouldBe Array((1L, "alpha text", "src0"), (2L, "beta", "src1"))
    // corrupt line -> _corrupt_record, not a failed read
    val badPath = new java.io.File(dir, "bad.jsonl").getAbsolutePath
    java.nio.file.Files.writeString(java.nio.file.Paths.get(badPath),
      """{"doc_id": 1, "text": "ok", "source": "s"}""" + "\nnot json at all\n")
    // (cache first: Spark refuses corrupt-column-only queries on the
    // raw file scan)
    val withCorrupt = spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .json(badPath)
      .cache()
    try {
      withCorrupt.filter(col("_corrupt_record").isNotNull).count() shouldBe 1L
      withCorrupt.filter(col("_corrupt_record").isNull).count() shouldBe 1L
    } finally withCorrupt.unpersist()
  }
}

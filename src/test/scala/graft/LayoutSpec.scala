package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Layout

/** Pins the Z-order key arithmetic and the layout property it exists
  * for: after clusterByZ, each output partition (= output file at
  * write) covers a tight rectangle in BOTH dimensions, so min/max
  * stats prune on either predicate column. */
class LayoutSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("zOrderKey interleaves bits (known values)") {
    def z(x: Long, y: Long): Long =
      Seq((x, y)).toDF("x", "y")
        .select(Layout.zOrderKey(col("x"), col("y")).as("z"))
        .collect().head.getLong(0)
    z(0L, 0L) shouldBe 0L
    z(1L, 0L) shouldBe 1L  // x occupies even bit positions
    z(0L, 1L) shouldBe 2L  // y occupies odd
    z(1L, 1L) shouldBe 3L
    z(2L, 0L) shouldBe 4L
    z(0L, 2L) shouldBe 8L
    z(3L, 5L) shouldBe 39L // 0b100111: x=11 -> bits 0,2; y=101 -> bits 1,5
  }

  test("clusterByZ partitions are tight rectangles in BOTH dimensions") {
    val n = 1 << 12
    val pts = spark.range(n).select(
      (col("id") % 64).as("x"),
      (col("id") / 64).cast("long").as("y")) // 64x64 grid
    def spans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val rows = df
        .withColumn("__pid", spark_partition_id())
        .groupBy("__pid")
        .agg((max(col("x")) - min(col("x"))).as("xs"),
          (max(col("y")) - min(col("y"))).as("ys"))
        .agg(avg(col("xs")), avg(col("ys"))).collect().head
      (rows.getDouble(0), rows.getDouble(1))
    }
    val (zx, zy) = spans(Layout.clusterByZ(pts, "x", "y", numFiles = 16, bits = 6))
    // one-dimensional range layout: x is tight, y spans the world
    val (rx, ry) = spans(pts.repartitionByRange(16, col("x")))
    zx should be < 64.0 * 0.6 // both dims bounded well under full range
    zy should be < 64.0 * 0.6
    ry should be > 60.0       // x-only layout leaves y unclustered
    (zx + zy) should be < (rx + ry) // z wins on combined span
  }

  test("globalOrdinals equals the window row_number with no global sort, any partitioning") {
    val df = spark.range(0, 5000).select(
      (col("id") * 37 % 5000).as("k")) // permuted unique keys
    def run(d: org.apache.spark.sql.DataFrame) =
      Layout.globalOrdinals(d, Seq("k"), numPartitions = Some(7))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run(df.repartition(13))
    got.size shouldBe 5000
    // rank of k in sorted order is k+1 (keys are exactly 0..4999)
    (0L until 5000L by 997L).foreach { k => got(k) shouldBe k + 1 }
    got(4999L) shouldBe 5000L
    run(df.repartition(3)) shouldBe got // partitioning-invariant
    // and the plan has no single-partition global Sort: the exchange
    // is a range partitioning over 7 partitions
    val plan = Layout.globalOrdinals(df, Seq("k"), numPartitions = Some(7))
      .queryExecution.executedPlan.toString
    plan should not include "SinglePartition"
  }

  test("compactParquet: collapses a small-file mess to the target size, " +
       "preserves content exactly, and re-clusters when asked") {
    val work = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    val messy = s"$work/messy"
    val df = (1L to 4000L).map(i => (i, s"doc $i", i % 13)).toDF("id", "text", "k")
    df.repartition(64).write.parquet(messy) // the streaming-ingest debris shape
    val before = spark.read.parquet(messy)
      .agg(count(lit(1)), sum(col("id")), sum(md5(col("text")).substr(1, 4).isNotNull.cast("long")))
      .collect().head
    val (_, bytes) = {
      val d = new java.io.File(messy)
      val parts = d.listFiles().filter(f => f.isFile && f.getName.startsWith("part-"))
      (parts.length, parts.map(_.length).sum)
    }
    val stats = Layout.compactParquet(spark, messy, s"$work/compact",
      targetBytes = bytes / 4 + 1)
    stats.filesBefore shouldBe 64
    stats.filesAfter should be <= 4
    stats.filesAfter should be >= 1
    stats.rows shouldBe 4000L
    val after = spark.read.parquet(s"$work/compact")
      .agg(count(lit(1)), sum(col("id")), sum(md5(col("text")).substr(1, 4).isNotNull.cast("long")))
      .collect().head
    after shouldBe before // content-identical, order-free

    // sorted compaction: each output file covers a disjoint id range
    val s2 = Layout.compactParquet(spark, messy, s"$work/clustered",
      targetBytes = bytes / 4 + 1, sortCols = Seq("id"))
    s2.rows shouldBe 4000L
    val spans = spark.read.parquet(s"$work/clustered")
      .groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => hi1 should be < lo2
      case _ => ()
    }
  }

  test("sortedNeighborPairs == zip(sorted, sorted.tail): boundary pairs " +
      "across partitions, empty partitions, any input partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val rows = (1L to 500L).map(i => (rnd.nextInt(40).toLong, i))
    val expect = rows.sorted.sliding(2).collect {
      case Seq((k1, v1), (k2, v2)) => (k1, v1, k2, v2)
    }.toSet
    for (parts <- Seq(1, 7); outParts <- Seq(None, Some(3), Some(64))) {
      // Some(64) > distinct keys exercises EMPTY output partitions:
      // the boundary successor must skip them
      val got = Layout.sortedNeighborPairs(
          rows.toDF("k", "v").repartition(parts), Seq("k", "v"),
          numPartitions = outParts)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      withClue(s"parts=$parts outParts=$outParts") { got shouldBe expect }
    }
    // empty and single-row inputs produce no pairs
    Layout.sortedNeighborPairs(Seq.empty[(Long, Long)].toDF("k", "v"),
      Seq("k", "v")).count() shouldBe 0L
    Layout.sortedNeighborPairs(Seq((1L, 1L)).toDF("k", "v"),
      Seq("k", "v")).count() shouldBe 0L
  }

  test("contentDigest: order/partition-invariant, rollup total is the " +
      "xor of shard digests, a single-row change flips exactly one shard") {
    import spark.implicits._
    val docs = (1L to 400L).map(i => (i, s"text body $i")).toDF("id", "txt")
    def digestMap(df: org.apache.spark.sql.DataFrame) =
      Layout.contentDigest(df, "id", "txt", nShards = 8)
        .collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) ->
          ((r.getLong(1), r.getLong(2)))).toMap
    val base = digestMap(docs)
    base.size shouldBe 9 // 8 shards + rollup total
    base(-1L)._1 shouldBe 400L
    // total digest = xor of per-shard digests
    val xorAll = base.filter(_._1 >= 0).values.map(_._2).reduce(_ ^ _)
    base(-1L)._2 shouldBe xorAll
    // row order / partitioning never changes any digest
    digestMap(docs.repartition(7).orderBy(desc("id"))) shouldBe base
    // one changed row: exactly one shard digest differs (counts equal)
    val mutated = docs.withColumn("txt",
      when(col("id") === 123L, lit("tampered")).otherwise(col("txt")))
    val mut = digestMap(mutated)
    // the rehashed row leaves one shard and enters another (possibly
    // the same); the mismatch localizes to at most 2 of 8 shards and
    // the grand total always flips
    val changedShards = base.keys.filter(k => k >= 0 && mut(k) != base(k)).toSeq
    changedShards.size should (be >= 1 and be <= 2)
    mut(-1L)._2 should not be base(-1L)._2
    mut(-1L)._1 shouldBe 400L
  }
}

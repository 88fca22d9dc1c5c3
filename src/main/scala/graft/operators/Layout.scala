package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators — the write-side half of 100 TB scan
  * performance. Parquet scans prune with per-file (and per-row-group)
  * min/max statistics; those statistics only help if the writer
  * CLUSTERED the data so each file covers a narrow value range.
  * Range-partitioning on one column does that for one predicate
  * dimension; a Z-ORDER key does it for two at once by interleaving
  * their bits, so files are tight rectangles in (x, y) space and
  * point/range predicates on EITHER column skip most files.
  */
object Layout {

  /** Morton (Z-order) key: interleave the low `bits` bits of two
    * non-negative long columns — x in the even positions, y in the
    * odd. Pure codegen'd integer bit arithmetic (2·bits shift-mask
    * terms OR-folded), no UDF, no shuffle. Inputs are masked to
    * `bits` bits (callers bucket-quantize wider domains first —
    * standard Z-order practice; the key is a clustering coordinate,
    * not a lossless encoding). */
  def zOrderKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "need 1 <= bits <= 31")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Global 1-based ordinals by a total order WITHOUT the
    * single-partition sort a global `row_number()` window plans
    * (Matcher.prepareReference documents that trap and caps its
    * input; THIS is the corpus-scale form). Range-repartition on the
    * order columns — partitions are globally ordered, each sorted
    * locally — then one metadata-sized pass collects per-partition
    * counts, and each partition adds its exclusive prefix offset to
    * its local index. The shuffled-and-sorted RDD is persisted
    * between the two passes, so the range shuffle + sort runs ONCE;
    * driver state is one long per partition.
    *
    * The order columns must be a total key (unique) for the ordinals
    * to be deterministic — range-boundary SAMPLING is not, but with a
    * unique key every row's global rank is well-defined whatever the
    * partition boundaries. */
  def globalOrdinals(df: DataFrame, orderCols: Seq[String],
                     ordCol: String = "ordinal",
                     numPartitions: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.LongType
    val cols = orderCols.map(col)
    val sorted = numPartitions
      .map(n => df.repartitionByRange(n, cols: _*))
      .getOrElse(df.repartitionByRange(cols: _*))
      .sortWithinPartitions(cols: _*)
    // ONE materialization of the range shuffle + sort, shared by both
    // passes (without it each `.rdd` below re-plans the shuffle and
    // the sort runs twice — the RDD.zipWithIndex recompute trap).
    // MEMORY_AND_DISK so a 100 TB input spills instead of OOMing; the
    // ContextCleaner unpersists it once the result's lineage is
    // unreachable.
    val sortedRdd = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-partition row counts (one long per partition)
    val counts = sortedRdd
      .mapPartitionsWithIndex { (i, it) => Iterator((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _) // exclusive prefix sums
    val outSchema = sorted.schema.add(ordCol, LongType, nullable = false)
    val outRdd = sortedRdd.mapPartitionsWithIndex { (i, it) =>
      var ord = offsets(i)
      it.map { r => ord += 1; Row.fromSeq(r.toSeq :+ ord) }
    }
    sorted.sparkSession.createDataFrame(outRdd, outSchema)
  }

  /** ADJACENT-ROW PAIRS in global sort order: each row joined with
    * its successor under the total order `orderCols` — the neighbor
    * primitive of suffix-array LCP ([[SuffixDedup]]), sorted-run
    * diffing, and gap detection. Emits n−1 rows, columns prefixed
    * `a_`/`b_`.
    *
    * The declarative form ([[globalOrdinals]] + self-join on
    * ordinal±1) pays a SECOND full shuffle to hash-join the frame
    * with itself; at suffix scale the payload is the wide prefix
    * column, so that join dominated the whole pipeline (measured
    * ~2× of q229 at sf0.1). Here adjacency is read off the range
    * shuffle directly: partitions are globally ordered and locally
    * sorted, so all pairs are consecutive rows WITHIN a partition —
    * except the one pair straddling each boundary, which needs only
    * each partition's FIRST row. Those are one collect of
    * numPartitions rows; each partition then pairs its run and
    * closes with (its last row, the next non-empty partition's
    * first). One shuffle total, driver state one row per partition —
    * the same RDD-drop-down contract as [[globalOrdinals]], for the
    * same reason (per-partition adjacency is not expressible in
    * declarative ops without re-shuffling). */
  def sortedNeighborPairs(df: DataFrame, orderCols: Seq[String],
                          aPrefix: String = "a_", bPrefix: String = "b_",
                          numPartitions: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    val cols = orderCols.map(col)
    val sorted = numPartitions
      .map(n => df.repartitionByRange(n, cols: _*))
      .getOrElse(df.repartitionByRange(cols: _*))
      .sortWithinPartitions(cols: _*)
    val sortedRdd = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nParts = sortedRdd.getNumPartitions
    // pass 1: each partition's first row (bounded: one row/partition)
    val firsts = sortedRdd.mapPartitionsWithIndex { (i, it) =>
      if (it.hasNext) Iterator((i, it.next())) else Iterator.empty
    }.collect().toMap
    val bc = sorted.sparkSession.sparkContext.broadcast(firsts)
    val fields = sorted.schema.fields
    val outSchema = StructType(
      fields.map(f => f.copy(name = aPrefix + f.name)) ++
        fields.map(f => f.copy(name = bPrefix + f.name)))
    val pairsRdd = sortedRdd.mapPartitionsWithIndex { (i, it) =>
      val nextFirst = (i + 1 until nParts).iterator
        .flatMap(bc.value.get).nextOption()
      new Iterator[Row] {
        private var prev: Row = if (it.hasNext) it.next() else null
        private var tailDone = false
        def hasNext: Boolean = prev != null &&
          (it.hasNext || (nextFirst.isDefined && !tailDone))
        def next(): Row = {
          val p = prev
          if (it.hasNext) { prev = it.next(); Row.fromSeq(p.toSeq ++ prev.toSeq) }
          else { tailDone = true; Row.fromSeq(p.toSeq ++ nextFirst.get.toSeq) }
        }
      }
    }
    sorted.sparkSession.createDataFrame(pairsRdd, outSchema)
  }

  /** Cluster a frame for writing: range-partition on the Z key into
    * `numFiles` output partitions and sort within each — every output
    * file then covers a compact Z range, i.e. a tight (x, y)
    * rectangle, which is exactly what min/max pruning needs. One
    * range shuffle (with Spark's range-boundary sampling); the sort
    * is per-partition. */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
                 numFiles: Int, bits: Int = 16): DataFrame = {
    val z = zOrderKey(col(xCol), col(yCol), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Before/after footprint of a [[compactParquet]] run. */
  final case class CompactionStats(filesBefore: Int, bytesBefore: Long,
                                   filesAfter: Int, bytesAfter: Long,
                                   rows: Long)

  /** Small-file compaction — the maintenance pass every long-lived
    * 100 TB table needs: streaming ingest, per-trigger sinks, and
    * fine-grained partition writes all accrete KB-sized part files,
    * and at scale the SCAN cost becomes file-open/footer overhead,
    * not bytes (10⁶ tiny files = 10⁶ footer reads + task-schedule
    * round trips). Sizes the output from the INPUT footprint:
    * `ceil(bytes / targetBytes)` files, one round-robin shuffle —
    * or, with `sortCols`, one range shuffle + within-file sort so
    * compaction simultaneously RE-CLUSTERS for min/max pruning (the
    * [[clusterByZ]] write discipline). Uses the Hadoop FileSystem
    * API throughout, so the same code runs against HDFS/object
    * stores. Rewrites to `outPath` (never in place — swap is the
    * caller's atomic-rename/metastore step). */
  /** Order-free CONTENT DIGEST of a dataset, per hash-shard plus the
    * rolled-up total — the integrity audit that certifies "these two
    * copies/snapshots hold exactly the same rows" without comparing
    * any row: per shard, the row count and the BIT_XOR of a 56-bit
    * md5 row fingerprint. XOR is commutative/associative and never
    * overflows, so the digest is independent of row order, partition
    * count, and accumulation order — two 100 TB replicas compare by
    * exchanging (nShards+1) rows. A rollup supplies the grand-total
    * digest row (shard NULL) in the same single aggregate. Any
    * single-row difference flips ~28 digest bits in exactly one
    * shard, so the mismatch localizes to 1/nShards of the data for
    * the (rare) row-level diff that follows. */
  def contentDigest(df: DataFrame, idCol: String, payloadCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be positive")
    val h = conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
      col(payloadCol).cast("string"))), 1, 14), 16, 10).cast("long")
    df.select(pmod(h, lit(nShards.toLong)).as("shard"), h.as("__h"))
      .rollup(col("shard"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__h)").as("digest"))
  }

  def compactParquet(spark: org.apache.spark.sql.SparkSession,
                     inPath: String, outPath: String, targetBytes: Long,
                     sortCols: Seq[String] = Nil): CompactionStats = {
    require(targetBytes >= 1, "targetBytes must be positive")
    import org.apache.hadoop.fs.Path
    def footprint(p: String): (Int, Long) = {
      val path = new Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val parts = fs.listStatus(path)
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      (parts.length, parts.map(_.getLen).sum)
    }
    val (filesBefore, bytesBefore) = footprint(inPath)
    val nOut = math.max(1L, (bytesBefore + targetBytes - 1) / targetBytes)
      .min(Int.MaxValue).toInt
    val df = spark.read.parquet(inPath)
    val sized =
      if (sortCols.isEmpty) df.repartition(nOut)
      else df.repartitionByRange(nOut, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    sized.write.mode("overwrite").parquet(outPath)
    val (filesAfter, bytesAfter) = footprint(outPath)
    // parquet metadata-only count: no data pages are read
    val rows = spark.read.parquet(outPath).count()
    CompactionStats(filesBefore, bytesBefore, filesAfter, bytesAfter, rows)
  }
}

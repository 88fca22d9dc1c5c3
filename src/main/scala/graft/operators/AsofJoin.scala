package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the single most recent
  * right row with the same key and `rightTime <= leftTime`
  * (inclusive). The canonical time-series enrichment ("price as of
  * the trade", "last click before the purchase") that relational
  * Spark has no operator for.
  *
  * Implementation is the union-merge form, not a join: tag both
  * inputs, union them into one stream keyed on the join key, sort
  * each key's partition by (time, side) — right rows before left rows
  * at equal timestamps, which is exactly the inclusive `<=` bound —
  * and run `last(right_payload, ignoreNulls)` over the unbounded
  * preceding window. That window is a RUNNING aggregate: Spark
  * evaluates it with O(1) state per row (one held struct), never
  * buffering a frame.
  *
  * Scale shape: ONE shuffle, keyed on the join key, carrying
  * left+right exactly once each — versus the naive
  * `left JOIN right ON key AND rt <= lt` + window-rank form, whose
  * join output is |left| × (matching rights) BEFORE the rank prunes
  * it (quadratic per key in event density). Per-key cost is the sort;
  * state is one struct regardless of history length. A pathologically
  * hot key serializes through one partition's sort — at 100 TB the
  * standard refinement is per-(key, coarse time bucket) packing with
  * a per-bucket boundary carry, but per-key sort is the right default
  * while keys are users/instruments (bounded history each).
  *
  * Right rows must be unique per (key, time) — pre-aggregate
  * duplicates first (the result would otherwise be order-dependent,
  * in any engine; DuckDB's ASOF JOIN has the same contract).
  */
object AsofJoin {

  /** @param right its non-key columns become the payload, emitted
    *              with their own names (rename upstream on clash;
    *              this asserts there is none). A left row with no
    *              prior right row gets nulls. */
  def asofBackward(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String): DataFrame = {
    val payloadCols = right.columns.filterNot(_ == rightKey)
    require(payloadCols.contains(rightTime), s"right is missing $rightTime")
    val clash = payloadCols.intersect(left.columns)
    require(clash.isEmpty,
      s"right payload columns clash with left: ${clash.mkString(", ")}")
    // __k/__t/__side/__l/__r/__match are internal; an input already
    // carrying a __-prefixed column would silently shadow them mid-plan
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"column names starting with '__' are reserved by asofBackward: ${reserved.mkString(", ")}")

    val lStructType = left.select(struct(left.columns.map(col): _*).as("__l"))
      .schema("__l").dataType
    val rStructType = right.select(struct(payloadCols.map(col): _*).as("__r"))
      .schema("__r").dataType

    val lRows = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rStructType).as("__r"))
    val rRows = right.select(
      col(rightKey).as("__k"), col(rightTime).cast(left.schema(leftTime).dataType).as("__t"),
      lit(0).as("__side"),
      lit(null).cast(lStructType).as("__l"),
      struct(payloadCols.map(col): _*).as("__r"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lRows.unionByName(rRows)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: payloadCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** [[asofBackward]] with per-(key, time-bucket) packing — the
    * hot-key refinement the plain form's docstring names: a
    * pathologically hot key serializes through ONE partition's sort
    * there; here the heavy merge is partitioned by (key, bucket of
    * span µs), so a hot key's history spreads across its time range.
    *
    * Construction: each bucket's candidate set = the right rows OF
    * that bucket plus ONE boundary-carry row — the latest right row
    * from any earlier bucket — so the within-bucket union-merge is
    * self-contained. The carry is built on the per-key bucket SPINE
    * (distinct buckets of either side): per (key, bucket) keep the
    * last right row (keyed aggregate), then one per-key window over
    * the spine propagates the running last across empty buckets. That
    * window IS per-key sequential, but over ≤ time-range/span rows —
    * bucket COUNT, not event count; pick span so a key's bucket count
    * stays ~10³-10⁶ while each bucket's rows fit a task.
    *
    * Output is identical to [[asofBackward]] (q96 hash-proves it
    * against the same ASOF oracle). */
  def asofBackwardBucketed(left: DataFrame, right: DataFrame,
                           leftKey: String, rightKey: String,
                           leftTime: String, rightTime: String,
                           bucketSpan: Long): DataFrame = {
    require(bucketSpan > 0, "bucketSpan must be positive")
    val payloadCols = right.columns.filterNot(_ == rightKey)
    require(payloadCols.contains(rightTime), s"right is missing $rightTime")
    val clash = payloadCols.intersect(left.columns)
    require(clash.isEmpty,
      s"right payload columns clash with left: ${clash.mkString(", ")}")
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"column names starting with '__' are reserved by asofBackwardBucketed: ${reserved.mkString(", ")}")

    val lStructType = left.select(struct(left.columns.map(col): _*).as("__l"))
      .schema("__l").dataType
    val rStruct = struct(payloadCols.map(col): _*)
    val rStructType = right.select(rStruct.as("__r")).schema("__r").dataType

    def bucketOf(t: Column): Column = floor(t.cast("double") / bucketSpan).cast("long")

    val rT = col(rightTime).cast(left.schema(leftTime).dataType)
    val rRows = right.select(
      col(rightKey).as("__k"), rT.as("__t"), bucketOf(rT).as("__b"),
      rStruct.as("__r"))

    // one row per (key, bucket): the bucket's LAST right row
    val lastPerBucket = rRows
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("__k"), col("__b"))
          .orderBy(col("__t").desc)))
      .filter(col("__rn") === 1)
      .select(col("__k"), col("__b"), col("__t"), col("__r"))

    // per-key bucket spine (buckets either side touches), carry = the
    // running last right row STRICTLY BEFORE each bucket
    val lBuckets = left.select(col(leftKey).as("__k"),
      bucketOf(col(leftTime)).as("__b")).distinct()
    val spine = lBuckets
      .unionByName(lastPerBucket.select(col("__k"), col("__b")))
      .distinct()
    val wSpine = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carries = spine
      .join(lastPerBucket, Seq("__k", "__b"), "left")
      .withColumn("__run",
        // when() nulls the spine-only rows: a bare struct(null, null)
        // is NOT null and would clobber the running carry
        last(when(col("__t").isNotNull,
            struct(col("__t").as("t"), col("__r").as("r"))),
          ignoreNulls = true).over(wSpine))
      .withColumn("__carry", lag(col("__run"), 1).over(
        Window.partitionBy(col("__k")).orderBy(col("__b"))))
      .filter(col("__carry").isNotNull)
      .select(col("__k"), col("__b"),
        col("__carry.t").as("__t"), col("__carry.r").as("__r"))

    // within-bucket union-merge: bucket's own right rows + the carry
    // (whose time precedes the bucket start by construction)
    val candidates = rRows.select(col("__k"), col("__b"), col("__t"), col("__r"))
      .unionByName(carries)
      .select(col("__k"), col("__b"), col("__t"), lit(0).as("__side"),
        lit(null).cast(lStructType).as("__l"), col("__r"))
    val lRows = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"),
      bucketOf(col(leftTime)).as("__b"),
      lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rStructType).as("__r"))

    val w = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lRows.unionByName(candidates)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: payloadCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CHANGE-DATA-CAPTURE apply — the batch MERGE of the lakehouse
  * write path: fold an ordered changelog of upserts and deletes into
  * a base snapshot and emit the post-image. The complement of the
  * q125 snapshot DIFF (diff derives a changelog; this applies one)
  * and the batch twin of the q39 streaming upsert.
  *
  * Contract: within a key, `seqCol` totally orders the changes (the
  * usual commit/LSN column); the base snapshot acts as sequence
  * −∞. Last write wins; a final `D` op deletes the key.
  *
  * Scale shape: ONE key-grouped aggregate using the max-of-struct
  * trick — `max(struct(seq, op, payload…))` picks each key's latest
  * version with full map-side combining — instead of the
  * row_number-over-key window a naive MERGE plans (same shuffle, no
  * per-partition sort buffer). Deletes filter AFTER the fold, so a
  * delete-then-reinsert sequence resolves correctly by seq order. */
object Cdc {

  /** INCREMENTAL VIEW MAINTENANCE of a grouped count/sum aggregate
    * under a changelog — the materialized-view refresh that touches
    * only CHANGED keys instead of rescanning the 100 TB base:
    * retract each affected key's pre-image contribution, add its
    * post-image contribution, and merge the per-group deltas into
    * the existing aggregate (counts/sums are the self-maintainable
    * aggregates; min/max are not — they need the base on deletes).
    *
    * Work is O(|changed keys| + |groups|): one semi-join pulls the
    * pre-images, one [[applyChangelog]] fold over the same slice
    * builds the post-images, and the delta collapses map-side
    * before the outer-merge with the old aggregate. Groups whose
    * maintained count reaches 0 drop out of the view. */
  def maintainGroupedAgg(baseAgg: DataFrame, base: DataFrame,
      changes: DataFrame, keyCol: String, seqCol: String, opCol: String,
      groupCol: String, centsCol: String): DataFrame = {
    val changedKeys = changes.select(col(keyCol)).distinct()
    val pre = base.join(changedKeys, Seq(keyCol), "left_semi")
      .select(col(groupCol), lit(-1L).as("__dc"),
        (-col(centsCol)).as("__ds"))
    val post = applyChangelog(
        base.join(changedKeys, Seq(keyCol), "left_semi"), changes,
        keyCol, seqCol, opCol, Seq(groupCol, centsCol))
      .select(col(groupCol), lit(1L).as("__dc"), col(centsCol).as("__ds"))
    val delta = pre.unionByName(post)
      .groupBy(col(groupCol))
      .agg(sum(col("__dc")).as("__dcnt"), sum(col("__ds")).as("__dsum"))
    baseAgg.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dcnt"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("sum_cents"), lit(0L))
          + coalesce(col("__dsum"), lit(0L))).as("sum_cents"))
      .filter(col("n_rows") > 0)
  }

  /** @param changes rows `(keyCol, seqCol, opCol, payloadCols…)`,
    *   `opCol` ∈ {"I","U","D"} (D's payload is ignored).
    * @return the post-image: one row per surviving key with
    *   `(keyCol, payloadCols…)`. */
  def applyChangelog(base: DataFrame, changes: DataFrame, keyCol: String,
      seqCol: String, opCol: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    val baseTagged = base.select(
      col(keyCol) +:
        lit(Long.MinValue).as("__seq") +:
        lit("I").as("__op") +:
        payloadCols.map(col): _*)
    val chTagged = changes.select(
      col(keyCol) +:
        col(seqCol).cast("long").as("__seq") +:
        col(opCol).as("__op") +:
        payloadCols.map(col): _*)
    baseTagged.unionByName(chTagged)
      .groupBy(col(keyCol))
      .agg(max(struct(
        (col("__seq") +: col("__op") +: payloadCols.map(col)): _*))
        .as("__last"))
      .filter(col("__last.__op") =!= "D")
      .select(col(keyCol) +:
        payloadCols.map(c => col(s"__last.$c").as(c)): _*)
  }
}

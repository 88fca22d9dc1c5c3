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

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ENTITY RESOLUTION — blocked Fellegi-Sunter record matching: find
  * pairs of records that describe the same real-world entity
  * (duplicate customers, merged accounts, vendor master dedup) by
  * comparing field-level agreement under integer log-odds weights.
  * The structured-record sibling of the text near-dup tier (MinHash/
  * SimHash work on prose; this works on typed fields).
  *
  * Scale shape: candidate pairs come ONLY from within blocks (the
  * `blockCol` equi-self-join — phone prefix, zip, name initial), the
  * standard blocking discipline that turns the O(n²) all-pairs
  * comparison into Σ|block|² work bounded by the blocking key's
  * selectivity; skewed blocks are the caller's cap (the LSH
  * hot-bucket treatment — pick a finer key or salt the block).
  * Per-pair scoring is a pure codegen'd projection: each field rule
  * contributes its agreement weight (micro-scaled integer log-odds),
  * the pair survives at `score ≥ thresholdMicros`. Everything is
  * exact integers + deterministic predicates, so an oracle restates
  * every agreement bit and score. */
object EntityResolution {

  /** One field comparison: `agree(aCol, bCol)` must be a
    * deterministic boolean expression; agreement adds
    * `wAgreeMicros`, disagreement adds `wDisagreeMicros`
    * (typically negative). */
  final case class FieldRule(name: String, column: String,
      agree: (Column, Column) => Column,
      wAgreeMicros: Long, wDisagreeMicros: Long)

  /** @return pairs `(id_a, id_b, agree_<rule>…, score_micros)` with
    *   `id_a < id_b`, one row per surviving in-block pair. */
  def fellegiSunter(records: DataFrame, idCol: String, blockCol: String,
      rules: Seq[FieldRule], thresholdMicros: Long): DataFrame = {
    require(rules.nonEmpty, "need at least one field rule")
    val dataCols = (idCol +: blockCol +: rules.map(_.column)).distinct
    val slim = records.select(dataCols.map(col): _*)
    def side(p: String) =
      slim.columns.foldLeft(slim)((d, c) => d.withColumnRenamed(c, s"${p}_$c"))
    val pairs = side("a").join(side("b"),
      col(s"a_$blockCol") === col(s"b_$blockCol") &&
        col(s"a_$idCol") < col(s"b_$idCol"))
    val bits = rules.map(r =>
      r.agree(col(s"a_${r.column}"), col(s"b_${r.column}"))
        .as(s"agree_${r.name}"))
    val scored = pairs.select(
      (col(s"a_$idCol").as("id_a") +: col(s"b_$idCol").as("id_b") +:
        bits): _*)
    val score = rules.map(r =>
      when(col(s"agree_${r.name}"), lit(r.wAgreeMicros))
        .otherwise(lit(r.wDisagreeMicros))).reduce(_ + _)
    scored.withColumn("score_micros", score)
      .filter(col("score_micros") >= thresholdMicros)
  }
}

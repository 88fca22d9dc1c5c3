package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-corpus hygiene step that
  * flags documents sharing word n-grams with a held-out evaluation
  * set, so eval answers don't leak into training data.
  *
  * Scale shape is the whole point: the EVAL side is benchmarks —
  * thousands of documents against a 100 TB corpus — so its distinct
  * gram set broadcasts, and the train side is ONE scan: explode →
  * broadcast-hash left join (hit flag) → per-doc count/sum. Exploded
  * grams of one document stay inside their input partition, so the
  * aggregate collapses map-side and the only shuffle carries one
  * partial row per document, keyed on the unique id — no skew, and
  * nothing ever materializes train-gram × eval-gram pairs.
  *
  * Grams are distinct per document ([[Dedup.shingles]] word windows),
  * so `n_hits` counts distinct leaked n-grams, not occurrences —
  * the deduplicated-overlap definition benchmark decontamination
  * uses (a doc repeating one leaked phrase 100× is one hit).
  */
object Decontaminate {

  /** Per-train-document contamination report.
    *
    * @return one row per train document: (idCol, n_grams, n_hits,
    *         contaminated = n_hits >= minOverlap). Documents shorter
    *         than `n` words contribute their whole text as one gram.
    */
  def contaminationReport(train: DataFrame, eval: DataFrame,
                          idCol: String, textCol: String,
                          n: Int, minOverlap: Int): DataFrame = {
    require(n >= 1, "gram size must be >= 1")
    require(minOverlap >= 1, "minOverlap must be >= 1")

    val evalGrams = eval
      .select(explode(array_distinct(Dedup.shingles(col(textCol), n))).as("__gram"))
      .distinct()
      .withColumn("__hit", lit(1L))

    train
      .select(col(idCol),
        explode_outer(array_distinct(Dedup.shingles(col(textCol), n))).as("__gram"))
      .join(broadcast(evalGrams), Seq("__gram"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__gram")).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .select(col(idCol), col("n_grams"), col("n_hits"),
        (col("n_hits") >= minOverlap).as("contaminated"))
  }
}

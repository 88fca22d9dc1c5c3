package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based bitext (translation-pair) mining — the
  * LASER/CCMatrix-style alignment criterion (Artetxe & Schwenk 2019,
  * "Margin-based Parallel Corpus Mining"): a cross-lingual pair
  * (x, y) is mined not on raw cosine but on the RATIO margin
  * `cos(x,y) / ((avgNN_k(x) + avgNN_k(y)) / 2)` — how much closer y
  * is to x than x's and y's ordinary neighborhoods — which kills the
  * hub vectors that sit near everything. Pairs must also be MUTUAL
  * best-by-margin in both directions (the forward∩backward
  * intersection), the strictest of the paper's three strategies.
  *
  * Determinism: raw cosines are bit-identical across engines (the
  * q25 contract), each candidate cosine is micro-quantized ONCE, the
  * k-NN penalties are integer SUMS of those micros, and the margin is
  * one integer expression `cm·2k·1e6 div (penX+penY)` — guarded to
  * non-negative operands so Spark `div` ≡ DuckDB `//`. Ties break to
  * the lower partner id everywhere.
  *
  * Scale shape: both directions are the [[Ann.bruteForceTopK]]
  * broadcast scan here (k rows per vector survive); at corpus scale
  * swap the scan tier for IVF/graph candidates — the penalty sums,
  * margin projection, and mutual join are all keyed per-vector
  * (k-bounded), so nothing downstream of the candidate tier ever
  * sees the n² pairs.
  */
object Bitext {

  /** Mine mutual-best margin pairs between `xs` and `ys` (disjoint id
    * spaces expected). Returns one row per mutual-best pair:
    * (x_id, y_id, cos_micro, margin_micro, mined) where `mined` =
    * margin ≥ `thresholdMicro` (the paper's operating point 1.06 →
    * 1,060,000). Pairs whose candidate cosine is negative or whose
    * penalty denominator is non-positive are excluded (never
    * translation pairs; keeps the integer div exact). */
  def marginMine(xs: DataFrame, ys: DataFrame, idCol: String,
                 vecCol: String, k: Int,
                 thresholdMicro: Long = 1060000L): DataFrame = {
    require(k >= 1, "need at least one neighbor for the penalty")
    val fwd = Ann.bruteForceTopK(xs, ys, idCol, idCol, vecCol, k)
      .select(col("q_id").as("x_id"), col("c_id").as("y_id"),
        round(col("score") * 1e6).cast("long").as("cm"))
    val bwd = Ann.bruteForceTopK(ys, xs, idCol, idCol, vecCol, k)
      .select(col("q_id").as("y_id"), col("c_id").as("x_id"),
        round(col("score") * 1e6).cast("long").as("cm"))
    val penX = fwd.groupBy(col("x_id")).agg(sum(col("cm")).as("px"))
    val penY = bwd.groupBy(col("y_id")).agg(sum(col("cm")).as("py"))
    def withMargin(cands: DataFrame): DataFrame = cands
      .join(penX, "x_id").join(penY, "y_id")
      .withColumn("den", col("px") + col("py"))
      .filter(col("cm") >= 0 && col("den") > 0)
      .withColumn("margin",
        expr(s"(cm * ${2L * k} * 1000000) div den"))
    val wf = Window.partitionBy(col("x_id"))
      .orderBy(col("margin").desc, col("y_id").asc)
    val bestF = withMargin(fwd)
      .withColumn("__r", row_number().over(wf)).filter(col("__r") === 1)
      .select(col("x_id"), col("y_id"), col("cm"), col("margin"))
    val wb = Window.partitionBy(col("y_id"))
      .orderBy(col("margin").desc, col("x_id").asc)
    val bestB = withMargin(bwd)
      .withColumn("__r", row_number().over(wb)).filter(col("__r") === 1)
      .select(col("x_id"), col("y_id"))
    bestF.join(bestB, Seq("x_id", "y_id"))
      .withColumn("mined", col("margin") >= thresholdMicro)
      .select(col("x_id"), col("y_id"), col("cm").as("cos_micro"),
        col("margin").as("margin_micro"), col("mined"))
  }
}

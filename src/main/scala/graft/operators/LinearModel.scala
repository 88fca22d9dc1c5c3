package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training of a linear quality classifier by full-batch
  * gradient descent — the trainable half of the curation gate family
  * (q17's heuristic scores, q86/q104's LM scorers): a production
  * corpus pipeline trains exactly this shape of model (a linear probe
  * over cheap per-doc statistics) to replace hand-tuned thresholds,
  * then scores 100 TB with a pure projection.
  *
  * Why this is certifiable where MLlib's LogisticRegression is not:
  *   - The activation is the RATIONAL "fast sigmoid"
  *     `p = 0.5·(1 + z/(1+|z|))` — division, addition and abs are
  *     correctly-rounded IEEE ops, so per-row probabilities are
  *     bit-identical across engines; `exp`'s rounding is
  *     implementation-defined, which would poison a cross-engine
  *     hash even through micro-rounding.
  *   - Per-row gradient contributions are micro-quantized to BIGINT
  *     BEFORE summation (`round(((p−y)·xⱼ)·10⁶)`), so the per-round
  *     gradient is an EXACT integer sum — order- and
  *     partition-independent where a double sum drifts with
  *     accumulation order (the q117/q118 discipline).
  *   - Each weight update is ONE fixed double expression over those
  *     exact integers: `wⱼ ← wⱼ − lr·((Gⱼ/10⁶)/N)`. A DuckDB oracle
  *     unrolling the same rounds replays the whole trajectory
  *     bit-for-bit (the [[Cluster.kmeansMicro]] / [[Graph.pageRank]]
  *     treatment).
  *
  * Scale shape: each round is one map-side-combining aggregate to a
  * SINGLE row (the gradient), broadcast back for the next round's
  * scoring — the corpus never shuffles, and per-round exchange is
  * O(features·tasks). Iteration count is a fixed budget, not a
  * convergence test, for bounded plans.
  */
object LinearModel {

  /** `z = ((w0·x0 + w1·x1) + …)` — left-assoc fold, the exact shape
    * the oracle SQL writes. Include an explicit all-ones bias column
    * in `xCols` for an intercept. */
  def z(xCols: Seq[String], wCols: Seq[String]): Column =
    xCols.zip(wCols).map { case (x, w) => col(w) * col(x) }
      .reduceLeft(_ + _)

  /** Rational fast sigmoid `0.5·(1 + z/(1+|z|))` ∈ (0,1) — monotone,
    * p ≥ 0.5 ⇔ z ≥ 0, and built only from correctly-rounded IEEE
    * ops so it is bit-identical across engines. */
  def fastSigmoid(zc: Column): Column =
    lit(0.5) * (lit(1.0) + zc / (lit(1.0) + abs(zc)))

  /** `iterations` rounds of full-batch GD from w = 0. `rows` must
    * carry DOUBLE feature columns `xCols` (include a `lit(1.0)` bias
    * column for an intercept) and a DOUBLE 0/1 label `yCol`.
    * Returns ONE row with a DOUBLE weight column per feature, named
    * `w_<xCol>`. */
  def trainFastSigmoidGD(rows: DataFrame, xCols: Seq[String], yCol: String,
      lr: Double, iterations: Int): DataFrame = {
    require(xCols.nonEmpty, "need at least one feature column")
    require(iterations >= 1, "iterations must be >= 1")
    val wCols = xCols.map(x => s"w_$x")
    val feat = rows.select((xCols.map(col) :+ col(yCol)): _*)
    var w: DataFrame = feat.sparkSession.range(1)
      .select(wCols.map(c => lit(0.0).as(c)): _*)
    for (_ <- 1 to iterations) {
      val scored = feat.crossJoin(broadcast(w))
        .withColumn("__p", fastSigmoid(z(xCols, wCols)))
      val gradAggs = count(lit(1)).as("__n") +:
        xCols.zipWithIndex.map { case (x, j) =>
          sum(round(((col("__p") - col(yCol)) * col(x)) * lit(1e6))
            .cast("long")).as(s"__g$j")
        }
      val grad = scored.agg(gradAggs.head, gradAggs.tail: _*)
      w = w.crossJoin(broadcast(grad))
        .select(wCols.zipWithIndex.map { case (wc, j) =>
          (col(wc) - lit(lr) * ((col(s"__g$j").cast("double") / lit(1e6))
            / col("__n").cast("double"))).as(wc)
        }: _*)
    }
    w
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float|double>` columns.
  *
  * Re-expresses the reference's sklearn `cosine_similarity` call
  * (`main.py:84-89`) as a native codegen [[DotProductExpr]] — a
  * fused primitive loop inside whole-stage codegen. (The first cut
  * used `aggregate(zip_with(...))`; higher-order functions are
  * interpreted per element, which dominated the flagship matcher's
  * runtime at sf0.1.) At 100 TB this is the difference between a
  * codegen'd loop and a boxed lambda call per element.
  */
object VectorOps {

  import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

  /** Elementwise product-sum in double precision: index-ordered
    * accumulation, deterministic regardless of partitioning (and
    * bit-identical to DuckDB's `list_dot_product` for the oracle). */
  def dotProduct(a: Column, b: Column): Column =
    toColumn(DotProductExpr(
      toExpression(a.cast("array<double>")),
      toExpression(b.cast("array<double>"))))

  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity of two vector columns (`main.py:86-89`).
    * Zero vectors score 0 — sklearn's `cosine_similarity` returns 0
    * rows for zero-norm inputs, and Spark 4's default ANSI mode would
    * otherwise raise DIVIDE_BY_ZERO instead of yielding NaN. */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(a, l2Norm(a), b, l2Norm(b))

  /** Cosine against a pre-normalized side: when the corpus side is
    * normalized once up-front (norm column materialized), per-pair
    * work drops to one dot product + one division. Zero-norm guard as
    * in [[cosine]]. */
  def cosineWithNorms(a: Column, aNorm: Column, b: Column, bNorm: Column): Column = {
    val denom = aNorm * bNorm
    when(denom === 0.0, lit(0.0)).otherwise(dotProduct(a, b) / denom)
  }

  /** L2-normalize a vector column (null-safe; zero vectors pass
    * through unchanged to avoid NaN). One-pass native expression —
    * the `transform(a, x => x / l2Norm(a))` form recomputes the norm
    * per element (O(d²), interpreted). */
  def normalize(a: Column): Column =
    toColumn(NormalizeExpr(toExpression(a.cast("array<double>"))))

  // --- int8 storage quantization -----------------------------------------

  /** Per-vector max-abs quantization scale. */
  def quantScale(a: Column): Column =
    array_max(transform(a.cast("array<double>"), x => abs(x)))

  /** Symmetric int8 quantization: q_i = round(x_i / scale * 127).
    * The 100 TB storage/bandwidth form of an embedding column — 4×
    * smaller than float32 at ≲1% cosine error, the standard trade for
    * ANN candidate generation (exact re-scoring reads the float
    * vectors for the top candidates only). Zero vectors quantize to
    * zeros. HOF-based (interpreted): quantization runs ONCE at ingest
    * and is IO-bound; a hot-path variant would be a codegen
    * expression like [[DotProductExpr]]. */
  def quantizeInt8(a: Column, scale: Column): Column =
    transform(a.cast("array<double>"),
      x => when(scale === 0.0, lit(0))
        .otherwise(round(x / scale * 127)).cast("tinyint"))

  /** Dequantize back to doubles: x̂_i = q_i * scale / 127. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale / 127)
}

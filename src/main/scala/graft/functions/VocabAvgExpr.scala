package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Mean word-vector sentence encoding over a broadcast vocabulary:
  * out[d] = (Σ_{t ∈ tokens, t ∈ vocab} vocab(t)(d)) · (1 / |tokens|),
  * the averaging MLlib's `Word2VecModel.transform` applies (sum of
  * in-vocabulary word vectors in token order, scaled by the FULL
  * token count including OOV — `axpy` then `scal(1/n)` — with an
  * all-zeros vector for the empty token list).
  *
  * Exists as a first-class expression (rather than the ML UDF) for
  * oracle replayability: when the vocabulary values are quantized to
  * multiples of 2^-s (see [[graft.embed.QuantizedVocabEmbedder]]),
  * every per-dimension token sum is EXACT in double arithmetic —
  * order-free — so a SQL engine can recompute the same sum with a
  * plain group aggregate, then apply the single rounding step
  * `sum · (1/n)` identically. The vocabulary ships inside the
  * expression (task-binary broadcast); intended for catalog-scale
  * vocabularies (the trained-embedder fit corpora), not web-scale
  * ones.
  *
  * Null ELEMENTS are ignored (treated OOV) but still count toward n,
  * matching the transform's sentence.size denominator.
  */
case class VocabAvgExpr(child: Expression, vocab: Map[String, Array[Double]], dim: Int)
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {

  require(dim > 0, "dim must be positive")

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_vocab_avg"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sum = new Array[Double](dim)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        vocab.get(arr.getUTF8String(i).toString) match {
          case Some(v) =>
            var d = 0
            while (d < dim) { sum(d) += v(d); d += 1 }
          case None => ()
        }
      }
      i += 1
    }
    val out = new Array[Any](dim)
    if (n == 0) {
      var d = 0
      while (d < dim) { out(d) = 0.0; d += 1 }
    } else {
      val factor = 1.0 / n
      var d = 0
      while (d < dim) { out(d) = sum(d) * factor; d += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): VocabAvgExpr =
    copy(child = newChild)
}

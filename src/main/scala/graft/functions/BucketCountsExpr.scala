package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Histogram of a bucket-id array into a fixed-width count vector:
  * out[i] = |{ j : child[j] = i }| for i in [0, dim), as doubles (the
  * TF vector shape the embedding path consumes).
  *
  * Exists for plan hygiene as much as speed: the declarative form —
  * `transform(sequence(0, dim-1), i -> size(filter(buckets, b -> b =
  * i)))` — references the bucket array inside dim lambda bodies, and
  * CollapseProject inlines the array's defining expression (tokenizer
  * UDF + per-token md5) into EVERY one of the dim probes: the whole
  * tokenize+hash chain ran 64× per row in q24's plan. A single
  * UnaryExpression evaluates its child exactly once and counts in one
  * O(n + dim) pass. Null bucket entries are ignored; out-of-range
  * ids (shouldn't exist after pmod) are ignored rather than thrown. */
case class BucketCountsExpr(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {

  require(dim > 0, "dim must be positive")

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_bucket_counts"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Any](dim)
    var i = 0
    while (i < dim) { counts(i) = 0.0; i += 1 }
    val n = arr.numElements()
    i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val b = arr.getLong(i)
        if (b >= 0 && b < dim)
          counts(b.toInt) = counts(b.toInt).asInstanceOf[Double] + 1.0
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): BucketCountsExpr =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** One-pass L2 normalization of an `array<double>` column.
  *
  * The declarative form — `transform(a, x => x / l2Norm(a))` — inlines
  * the norm computation into the lambda body, so each ELEMENT
  * recomputes the full O(d) norm: O(d²) per row, interpreted. This
  * expression computes the norm once and divides in a second tight
  * loop: O(2d), no boxing. Zero vectors pass through unchanged
  * (sklearn parity — same convention as VectorOps.cosine).
  */
case class NormalizeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] = Seq(ArrayType(DoubleType))

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_l2_normalize"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    var sq = 0.0
    // a null element nulls the result (the transform form's propagation)
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = arr.getDouble(i); sq += v * v; i += 1
    }
    i = 0
    if (sq == 0.0) {
      arr.copy()
    } else {
      val norm = math.sqrt(sq)
      val out = new Array[Any](n)
      i = 0
      while (i < n) { out(i) = arr.getDouble(i) / norm; i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeExpr =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sign-LSH band buckets of a dense vector against a fixed hyperplane
  * matrix: output element `b` is a long whose bit `r` is set iff
  * `vec · planes(b*bandSize + r) >= 0`.
  *
  * Replaces a per-plane `DotProductExpr(vec, array(lit...))` fan-out:
  * with 32 planes × 64 dims that form inlines 2048 double literals
  * into the generated code, and janino compilation dominates the
  * query. Here the plane matrix lives in THIS expression instance (a
  * plain JVM field, shipped in the serialized plan), and all
  * `nPlanes` dot products run in one tight primitive loop per row.
  *
  * CodegenFallback costs one boxed call per row; the projection
  * around it stays in whole-stage codegen. Semantics pinned equal to
  * the per-plane form by AnnSpec.
  */
case class SignBucketsExpr(child: Expression, planes: Array[Array[Double]],
                           bandSize: Int)
    extends UnaryExpression with CodegenFallback {

  require(bandSize >= 1 && bandSize <= 63, "bandSize must be in [1, 63]")
  require(planes.nonEmpty && planes.length % bandSize == 0,
    "planes must divide into bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_sign_buckets"

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val d = vec.numElements()
    val v = new Array[Double](d)
    var i = 0
    while (i < d) { v(i) = vec.getDouble(i); i += 1 }
    val nBands = planes.length / bandSize
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      var bucket = 0L
      var r = 0
      while (r < bandSize) {
        val p = planes(b * bandSize + r)
        val n = math.min(d, p.length)
        var dot = 0.0
        var j = 0
        while (j < n) { dot += v(j) * p(j); j += 1 }
        if (dot >= 0) bucket |= (1L << r)
        r += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SignBucketsExpr =
    copy(child = newChild)
}

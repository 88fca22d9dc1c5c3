package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen dot product over two `array<double>` columns.
  *
  * The built-in higher-order route (`aggregate(zip_with(a, b, *), 0,
  * +)`) is semantically right but `HigherOrderFunction`s are NOT
  * whole-stage-codegen'd — each element pays an interpreted lambda
  * call plus boxing, and the flagship matcher evaluates millions of
  * 64-wide dot products per batch. This expression generates a tight
  * primitive `for` loop instead (`ArrayData.getDouble` — no
  * allocation, no boxing), keeping the similarity kernel inside the
  * fused codegen stage with the rest of the projection.
  *
  * Accumulation is left-to-right in index order — bit-identical to
  * the fold the higher-order form computes, so DuckDB's
  * `list_dot_product` oracle parity is preserved.
  *
  * Semantics notes (vs the zip_with form): inputs are expected to be
  * equal-length, null-free numeric arrays (embedding columns);
  * mismatched lengths dot the common prefix rather than yielding
  * null.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers (VectorOps.dotProduct) always cast both sides to
  // array<double>, so no ExpectsInputTypes coercion is needed
  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var s = 0.0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

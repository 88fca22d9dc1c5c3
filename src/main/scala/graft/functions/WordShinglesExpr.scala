package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sliding word n-gram shingles over a pre-split token array.
  *
  * Replaces the higher-order form
  * `transform(sequence(1, size-n+1), i => array_join(slice(words,i,n), " "))`
  * whose per-shingle interpreted lambda + slice allocation dominated
  * the minhash pipelines. Here the whole shingle set is built in one
  * tight loop over the token `ArrayData` with `UTF8String.concatWs`
  * — no boxing, no per-element lambda dispatch.
  *
  * Semantics (identical to the HOF form, pinned by DedupSpec):
  * fewer than `n` tokens → a single shingle joining ALL tokens;
  * otherwise `len - n + 1` shingles of `n` tokens joined by one
  * space. Null input → null.
  *
  * CodegenFallback costs one boxed call per ROW (not per element);
  * the surrounding projection stays in whole-stage codegen.
  */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {

  require(n >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] = Seq(ArrayType(StringType))

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val len = words.numElements()
    var chk = 0
    while (chk < len) { // null token → null result (HOF-form propagation)
      if (words.isNullAt(chk)) return null
      chk += 1
    }
    if (len < n) {
      val all = new Array[UTF8String](len)
      var i = 0
      while (i < len) { all(i) = words.getUTF8String(i); i += 1 }
      new GenericArrayData(Array[Any](UTF8String.concatWs(space, all: _*)))
    } else {
      val out = new Array[Any](len - n + 1)
      val window = new Array[UTF8String](n)
      var i = 0
      while (i <= len - n) {
        var j = 0
        while (j < n) { window(j) = words.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(space, window.toIndexedSeq: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}

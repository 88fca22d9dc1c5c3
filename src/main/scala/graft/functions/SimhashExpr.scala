package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 60-bit SimHash of a (distinct) word array in ONE pass per row.
  *
  * Bit-identical to the relational formulation it replaces — per word
  * `conv(substring(md5(word), 1, 15), 16, 10)` (the first 15 hex
  * chars of the md5 as a 60-bit unsigned value), each word voting ±1
  * per bit, fingerprint bit b set iff the vote sum is positive — and
  * to the DuckDB oracle, which keeps exactly that SQL form.
  *
  * The relational form explodes every document's word set and runs a
  * 60-buffer vote aggregate over the exploded rows (9M rows × 60
  * conditional sums at 8× sf0.1). Here the whole vote loop happens
  * in-place over the carried array: no explode, no aggregate, no
  * shuffle — fingerprinting becomes a pure projection.
  *
  * CodegenFallback costs one boxed call per row (the md5 work
  * dominates anyway); DedupSpec pins equality with the relational
  * form.
  */
case class SimhashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] = Seq(ArrayType(StringType))

  override def nullable: Boolean = true

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val md = SimhashExpr.digests.get()
    val votes = new Array[Int](60)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (words.isNullAt(i)) return null // null element → null fingerprint
      md.reset()
      val bytes = md.digest(words.getUTF8String(i).getBytes)
      // first 15 hex chars = bytes 0..6 in full + high nibble of byte 7
      var h = 0L
      var j = 0
      while (j < 7) { h = (h << 8) | (bytes(j) & 0xffL); j += 1 }
      h = (h << 4) | ((bytes(7) & 0xffL) >>> 4)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

object SimhashExpr {
  /** MessageDigest is stateful and not thread-safe; expression
    * instances can be shared across local-mode task threads. */
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (the FastCDC/rsync family): split a text
  * at positions where the [[RollingFingerprintExpr]] polynomial
  * rolling hash of the trailing `k` codepoints satisfies
  * `h % 2^maskBits == 0`. Because boundaries depend only on LOCAL
  * content, an edit anywhere in a document shifts at most the chunks
  * it touches — the property that makes chunk-level dedup survive
  * insertions, where fixed-size chunking (q88) re-aligns every
  * later chunk. Expected chunk length ≈ 2^maskBits codepoints.
  *
  * Deterministic contract (what the DuckDB oracle replays):
  *  - gram `i` (1-based) covers codepoints `i..i+k-1`; a boundary
  *    cuts AFTER codepoint `i+k-1` when its hash % 2^maskBits == 0,
  *    except at the exact end of the text (no empty trailing chunk);
  *  - texts shorter than `k` codepoints are one whole-text chunk;
  *  - the empty text chunks to an empty array.
  * No min/max clamping — that is a sequential dependency; compose
  * with fixed re-chunking for a hard max.
  *
  * Pure projection like its sibling: no explode of the character
  * stream, no shuffle; one multiply-add-mod per codepoint.
  */
case class CdcChunksExpr(child: Expression, k: Int, maskBits: Int)
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {
  require(k >= 1, "k must be >= 1")
  require(maskBits >= 1 && maskBits <= 30, "maskBits must be in [1, 30]")

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(StringType)

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_cdc_chunks"

  private val mod = 1000000007L
  private val base = 257L
  private val mask = (1L << maskBits) - 1L

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return ArrayData.toArrayData(Array.empty[UTF8String])
    if (n < k)
      return ArrayData.toArrayData(
        Array(UTF8String.fromString(new String(cps, 0, n))))
    val nGrams = n - k + 1
    var pow = 1L
    var j = 1
    while (j < k) { pow = pow * base % mod; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = (h * base + cps(i)) % mod; i += 1 }
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    // gram starting at 0-based i0 ends at codepoint i0 + k (exclusive)
    if ((h & mask) == 0L && k < n) cuts += k
    i = 1
    while (i < nGrams) {
      h = ((h - cps(i - 1) * pow % mod + mod * mod) % mod * base +
        cps(i + k - 1)) % mod
      val cut = i + k
      if ((h & mask) == 0L && cut < n) cuts += cut
      i += 1
    }
    val bounds = (0 +: cuts :+ n).toArray
    val out = new Array[UTF8String](bounds.length - 1)
    i = 0
    while (i < out.length) {
      out(i) = UTF8String.fromString(
        new String(cps, bounds(i), bounds(i + 1) - bounds(i)))
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}

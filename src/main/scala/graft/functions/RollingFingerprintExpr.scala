package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Winnowing document fingerprint (Schleimer et al., MOSS) in ONE
  * pass per row: a polynomial ROLLING hash over the character
  * k-grams (base 257 mod 1e9+7 — one multiply-add-mod per character,
  * never re-hashing the gram), then the minimum hash of every
  * sliding window of `w` consecutive gram hashes, deduplicated and
  * sorted. Two near-identical documents share most selected minima,
  * and any match of length ≥ w+k−1 is GUARANTEED to contribute a
  * common fingerprint — the winnowing coverage property that plain
  * "every n-th hash" sampling lacks.
  *
  * Pure projection: no explode of the character stream, no window
  * function, no shuffle — the sliding minimum runs on a monotonic
  * deque in O(chars) per document. The DuckDB oracle states the
  * identical arithmetic relationally (`list_reduce` per gram +
  * window minima), so the hash match proves the kernel equals its
  * spec. Documents shorter than k chars fingerprint to the empty
  * array; fewer than w grams collapse to one global-min window.
  *
  * Character unit is the Unicode CODEPOINT (what DuckDB's
  * `unicode(substr(text,i,1))` sees), not the UTF-16 char.
  */
case class RollingFingerprintExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {
  require(k >= 1 && w >= 1, "k and w must be >= 1")

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(StringType)

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_rolling_fingerprint"

  private val mod = 1000000007L
  private val base = 257L

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.codePoints().toArray
    val n = cps.length
    if (n < k) return ArrayData.toArrayData(Array.empty[Long])

    // rolling hash of every k-gram: h_{i+1} = (h_i - c_i*base^{k-1})*base + c_{i+k}
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    var pow = 1L // base^{k-1} mod p
    var j = 1
    while (j < k) { pow = pow * base % mod; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = (h * base + cps(i)) % mod; i += 1 }
    hashes(0) = h
    i = 1
    while (i < nGrams) {
      h = ((h - cps(i - 1) * pow % mod + mod * mod) % mod * base +
        cps(i + k - 1)) % mod
      hashes(i) = h
      i += 1
    }

    // sliding-window minima via monotonic deque, O(nGrams)
    val win = math.min(w, nGrams)
    val selected = new java.util.TreeSet[java.lang.Long]()
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // deque holds indices, hashes increasing
    i = 0
    while (i < nGrams) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - win) head += 1
      if (i >= win - 1) selected.add(hashes(deque(head)))
      i += 1
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprintExpr =
    copy(child = newChild)
}

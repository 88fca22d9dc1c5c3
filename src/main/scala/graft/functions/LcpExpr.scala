package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-prefix LENGTH (in codepoints) of two strings — the
  * LCP kernel of the suffix-ordinal dedup family
  * ([[graft.operators.SuffixDedup]]).
  *
  * Works on the raw UTF-8 bytes: the common BYTE prefix is found with
  * one primitive loop, then truncated to the last complete codepoint
  * boundary and counted in codepoints (UTF-8 prefix equality and
  * codepoint prefix equality coincide — the encoding is
  * self-synchronizing — so no decode is needed). Matches DuckDB's
  * 1-based codepoint slicing semantics exactly: the oracle's
  * "smallest i where a[i:i] <> b[i:i], minus one" comprehension
  * computes the same number, so LCP values replay bit-for-bit
  * cross-engine.
  *
  * Codegen emits a static call (the loop is data-dependent, not
  * expression-tree-shaped), keeping the expression inside the fused
  * whole-stage projection — no UDF boxing, no Row allocation.
  */
case class LcpExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(StringType, StringType)

  override def nullable: Boolean = true

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_lcp"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LcpExpr.lcp(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LcpExpr.lcp($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcpExpr =
    copy(left = newLeft, right = newRight)
}

object LcpExpr {
  /** Codepoint LCP via byte comparison + boundary truncation. */
  def lcp(a: UTF8String, b: UTF8String): Long = {
    val ab = a.getBytes
    val bb = b.getBytes
    val n = math.min(ab.length, bb.length)
    var m = 0
    while (m < n && ab(m) == bb(m)) m += 1
    // count complete codepoints inside the m-byte common prefix
    var i = 0
    var chars = 0L
    while (i < m) {
      val c = ab(i) & 0xff
      val l =
        if (c < 0x80) 1
        else if (c < 0xe0) 2
        else if (c < 0xf0) 3
        else 4
      if (i + l <= m) { chars += 1; i += l }
      else i = m // partial trailing codepoint: not a common char
    }
    chars
  }
}

package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition hygiene pass
  * every multilingual corpus needs before dedup or hashing: the SAME
  * rendered text arrives from the web both precomposed (`é` U+00E9)
  * and decomposed (`e` + U+0301), and every downstream content key —
  * md5 fingerprints (q15), MinHash shingles, BPE states — treats the
  * two byte sequences as different documents unless ingest
  * canonicalizes. Spark has no built-in for this; DuckDB ships
  * `nfc_normalize`, which is the oracle pairing.
  *
  * The JDK `java.text.Normalizer` does the work. Fast path: for the
  * overwhelmingly-already-NFC real corpus, `isNormalized` is a scan
  * without allocation and the input string passes through untouched.
  * CodegenFallback costs one boxed call per row; the ICU-style
  * composition scan dominates, same trade as [[SimhashExpr]].
  */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc_normalize"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

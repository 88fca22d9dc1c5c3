package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused trained-langid scorer — the
  * [[graft.operators.TextAnalysis.langIdApply]] computation as ONE
  * in-row expression with the fitted model as expression state (the
  * fastText deployment posture: the model ships with the code, the
  * corpus never joins anything). Per row: char n-grams of
  * `substr(lower(text), 1, maxChars)`, each bucketed by the SAME
  * salted-md5 family as [[graft.operators.Curation.featureBucket]],
  * per-language exact integer score `prior + Σ w[lang][bucket]`, and
  * the deterministic argmax (ties → the lexicographically smallest
  * language; `langs` must be sorted).
  *
  * Bit-identical to the relational apply path (one md5 per gram,
  * integer sums — proven by the shared q263/q271 oracle chain), but
  * STATELESS: no aggregation, no join — which is what lets the
  * trained gate run inside a streaming micro-batch projection
  * (append mode allows no multi-aggregate plans). Rows whose prefix
  * has fewer than `n` chars score priors only (no grams), unlike the
  * relational path which emits no row — callers gate on
  * `n_grams > 0` where parity matters.
  *
  * Output: struct(trained_lang string, score_micros long,
  * n_grams long). */
case class LangIdScoreExpr(child: Expression, langs: Seq[String],
    weights: Seq[Seq[Long]], priors: Seq[Long], buckets: Int, n: Int,
    maxChars: Int, salt: String)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(langs.nonEmpty && langs == langs.sorted,
    "langs must be non-empty and sorted")
  require(weights.length == langs.length &&
    weights.forall(_.length == buckets),
    "need one buckets-wide weight row per language")
  require(priors.length == langs.length, "need one prior per language")
  require(buckets >= 2 && n >= 1 && maxChars >= n,
    "need buckets >= 2, n >= 1, maxChars >= n")

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("trained_lang", StringType, nullable = false),
    StructField("score_micros", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false)))

  override def prettyName: String = "graft_langid_score"

  private lazy val model = new LangIdScoreExpr.LangIdScorer(
    langs.toArray, weights.map(_.toArray).toArray, priors.toArray,
    buckets, n, maxChars, salt)

  override protected def nullSafeEval(input: Any): Any =
    model.scoreRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("langIdScorer", model,
      classOf[LangIdScoreExpr.LangIdScorer].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $mRef.scoreRow($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdScoreExpr =
    copy(child = newChild)
}

object LangIdScoreExpr {

  final class LangIdScorer private[functions] (
      langs: Array[String], weights: Array[Array[Long]],
      priors: Array[Long], buckets: Int, n: Int, maxChars: Int,
      salt: String) extends Serializable {

    @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

    /** The engine-portable bucket: first 14 hex chars of
      * md5("salt:gram") as a long, pmod buckets — exactly
      * [[graft.operators.Curation.featureBucket]]'s arithmetic. */
    private def bucket(gram: String): Int = {
      val d = md.get()
      d.reset()
      val h = d.digest((salt + ":" + gram).getBytes("UTF-8"))
      // 14 hex chars = 56 bits = first 7 bytes, non-negative
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
      (v % buckets).toInt
    }

    def scoreRow(text: UTF8String): InternalRow = {
      val full = text.toString.toLowerCase(java.util.Locale.ROOT)
      // Truncate and window by CODE POINT, matching the relational
      // path's Spark `substring`/`length` (and the DuckDB oracle) on
      // supplementary-plane text — UTF-16 code-unit indexing would
      // split grams differently past an astral character.
      val offs = new Array[Int](maxChars + 1)
      var cp = 0
      var j = 0
      while (j < full.length && cp < maxChars) {
        offs(cp) = j
        j += Character.charCount(full.codePointAt(j))
        cp += 1
      }
      offs(cp) = j
      val L = langs.length
      val scores = priors.clone()
      var nGrams = 0L
      var i = 0
      val last = cp - n
      while (i <= last) {
        val b = bucket(full.substring(offs(i), offs(i + n)))
        var l = 0
        while (l < L) { scores(l) += weights(l)(b); l += 1 }
        nGrams += 1
        i += 1
      }
      var best = 0
      var l = 1
      while (l < L) {
        if (scores(l) > scores(best)) best = l
        l += 1
      }
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(langs(best)), scores(best), nGrams))
    }
  }
}

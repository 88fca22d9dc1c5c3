package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-document word/n-gram repetition counters in ONE pass over the
  * carried token array — the raw ingredients of the Gopher-style
  * repetition quality filters ("Scaling Language Models: Methods,
  * Analysis & Insights from Training Gopher", §A1.1: duplicate
  * line/paragraph/n-gram fractions) that every LLM training-data
  * pipeline applies before anything else.
  *
  * Returns a struct of four counters (null iff the array is null):
  *   - n_words     — total tokens
  *   - n_distinct  — distinct tokens
  *   - top_bigram  — occurrence count of the most frequent adjacent
  *                   word 2-gram (0 when fewer than 2 tokens)
  *   - dup_trigram — total occurrences of adjacent word 3-grams whose
  *                   count exceeds 1 (0 when fewer than 3 tokens)
  *
  * The fractions themselves (`1 - n_distinct/n_words`,
  * `2·top_bigram/n_words`, `3·dup_trigram/n_words`) are derived in
  * plain SQL so the DuckDB oracle shares the exact IEEE expression
  * tree.
  *
  * Scale shape: the relational formulation explodes every document
  * into |tokens| gram rows and re-aggregates keyed on (doc, gram) —
  * a shuffle carrying the entire corpus token stream (the DuckDB
  * oracle keeps exactly that form). Here the counting happens
  * in-place with per-row hash maps bounded by document length, so
  * the whole quality pass stays a pure projection fused into the
  * scan — at 100 TB the difference between one read and a
  * corpus-wide shuffle. Same design as [[SimhashExpr]] /
  * [[ArrayIntersectCountExpr]]; CodegenFallback's one boxed call per
  * row is noise against the per-token hashing.
  */
case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(ArrayType(StringType))

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false),
    StructField("dup_trigram", IntegerType, nullable = false)))

  override def prettyName: String = "graft_repetition_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val words = new Array[String](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null // null element → null stats
      words(i) = arr.getUTF8String(i).toString
      i += 1
    }
    val distinct = new java.util.HashSet[String]()
    i = 0
    while (i < n) { distinct.add(words(i)); i += 1 }
    val bigrams = new java.util.HashMap[String, Int]()
    var topBigram = 0
    i = 0
    while (i < n - 1) {
      val g = words(i) + " " + words(i + 1)
      val c = bigrams.merge(g, 1, Integer.sum)
      if (c > topBigram) topBigram = c
      i += 1
    }
    val trigrams = new java.util.HashMap[String, Int]()
    i = 0
    while (i < n - 2) {
      trigrams.merge(words(i) + " " + words(i + 1) + " " + words(i + 2), 1, Integer.sum)
      i += 1
    }
    var dupTrigram = 0
    val it = trigrams.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > 1) dupTrigram += c
    }
    new GenericInternalRow(Array[Any](n, distinct.size(), topBigram, dupTrigram))
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

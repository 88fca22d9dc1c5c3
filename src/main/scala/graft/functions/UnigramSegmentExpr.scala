package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of a word under a unigram-LM piece vocabulary
  * (the SentencePiece / Kudo 2018 decode step, arXiv:1804.10959): the
  * minimum-total-cost split of the word into vocabulary pieces, costs
  * in integer micros (`round(-ln p · 10⁶)`), found by the standard
  * O(len · maxPieceLen) DP. The vocabulary rides as expression state
  * (parameter-sized, the BPE-merge-table / Aho-Corasick posture), so
  * encoding 100 TB is ONE fused codegen projection — no join, no
  * shuffle, no per-row hashing of anything but the piece lookups.
  *
  * Deterministic and oracle-replayable: costs are Longs, a path's
  * score is an exact integer sum, and ties break to the SHORTEST
  * last piece at every DP cell (candidates scanned k = 1..maxPieceLen
  * ascending, strictly-better-only updates) — a DuckDB oracle
  * unrolling the same DP with `row_number() ORDER BY score, k`
  * replays every cell. A character absent from the vocabulary falls
  * back to `unkCost` (certified queries never hit it: their
  * vocabularies carry every corpus character by construction).
  *
  * Output: struct(pieces array<string>, cost_micros long). */
case class UnigramSegmentExpr(child: Expression, pieces: Seq[String],
    costMicros: Seq[Long], maxPieceLen: Int, unkCost: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(pieces.nonEmpty && pieces.length == costMicros.length,
    "need one cost per piece")
  require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
  require(costMicros.forall(_ >= 0L) && unkCost >= 0L,
    "costs must be non-negative (they are -ln p in micros)")

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("cost_micros", LongType, nullable = false)))

  override def prettyName: String = "graft_unigram_segment"

  private lazy val model =
    UnigramSegmentExpr.build(pieces, costMicros, maxPieceLen, unkCost)

  override protected def nullSafeEval(input: Any): Any =
    model.segmentRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramSegmentExpr.UnigramModel].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $mRef.segmentRow($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegmentExpr =
    copy(child = newChild)
}

object UnigramSegmentExpr {

  final class UnigramModel private[functions] (
      costs: java.util.HashMap[String, java.lang.Long],
      maxLen: Int, unkCost: Long) extends Serializable {

    /** (best-path pieces, exact total cost). Ties at a DP cell go to
      * the SHORTEST candidate last piece (k ascending, strict `<`). */
    def segmentRow(word: UTF8String): InternalRow = {
      val s = word.toString
      val n = s.length
      if (n == 0)
        return new GenericInternalRow(Array[Any](
          new GenericArrayData(Array.empty[Any]), 0L))
      val best = new Array[Long](n + 1)
      val choice = new Array[Int](n + 1)
      java.util.Arrays.fill(best, Long.MaxValue)
      best(0) = 0L
      var i = 1
      while (i <= n) {
        var k = 1
        val km = math.min(maxLen, i)
        while (k <= km) {
          val prev = best(i - k)
          if (prev != Long.MaxValue) {
            val c = costs.get(s.substring(i - k, i))
            val cost: Long =
              if (c != null) c.longValue()
              else if (k == 1) unkCost
              else -1L
            if (cost >= 0L) {
              // Saturating add: with arbitrary caller vocabularies a
              // run of unkCost cells (Long.MaxValue/4 in UnigramLm)
              // would wrap negative and the corrupted path would win
              // the DP. Saturate to MaxValue - 1 so the cell stays
              // reachable (totality: backtrack always terminates) but
              // a saturated path never beats a finite one.
              val sc =
                if (prev > Long.MaxValue - 1L - cost) Long.MaxValue - 1L
                else prev + cost
              if (sc < best(i)) { best(i) = sc; choice(i) = k }
            }
          }
          k += 1
        }
        i += 1
      }
      val out = new java.util.ArrayList[Any]()
      var p = n
      while (p > 0) {
        val k = choice(p)
        out.add(0, UTF8String.fromString(s.substring(p - k, p)))
        p -= k
      }
      new GenericInternalRow(Array[Any](
        new GenericArrayData(out.toArray), best(n)))
    }
  }

  private[functions] def build(pieces: Seq[String], costMicros: Seq[Long],
      maxPieceLen: Int, unkCost: Long): UnigramModel = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
    pieces.zip(costMicros).foreach { case (p, c) =>
      m.put(p, java.lang.Long.valueOf(c))
    }
    new UnigramModel(m, maxPieceLen, unkCost)
  }
}

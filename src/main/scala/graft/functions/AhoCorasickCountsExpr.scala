package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-pattern substring-hit counts over a FIXED pattern dictionary in
  * ONE text pass — the multi-pattern blocklist kernel (bad-word /
  * spam-phrase / policy filtering, the C4-style curation stage): a
  * classic Aho-Corasick automaton (goto / fail / merged output links)
  * walks the text once, so the cost is O(|text| + hits) regardless of
  * how many patterns the dictionary holds. The naive alternative — one
  * `contains`/regex scan per pattern — re-reads every byte of a
  * 100 TB corpus |patterns| times; this expression reads it once.
  *
  * Count semantics per pattern: LEFTMOST NON-OVERLAPPING occurrences
  * (after a counted match the scan for THAT pattern resumes at the
  * match end; other patterns are unaffected) — exactly the number of
  * replacements `replace(text, pattern, '')` performs, so a SQL oracle
  * states the expected count as
  * `(length(t) - length(replace(t, p, ''))) / length(p)` with no
  * automaton of its own. Matching is exact (case handling belongs to
  * the caller: match on `lower(text)` with lowercase patterns).
  * Patterns that overlap EACH OTHER are counted independently, again
  * matching the per-pattern replace arithmetic.
  *
  * Output: `array<int>` of counts aligned with the constructor's
  * pattern order (callers zip with the pattern table via
  * `posexplode`). The automaton is built once on the driver and
  * ships with the expression — a pattern dictionary is parameter-like
  * state (thousands of entries, not data-scale), the same posture as
  * the BPE merge table. Codegen emits one static-shaped call on the
  * referenced automaton, keeping the scan inside the fused
  * whole-stage projection. */
case class AhoCorasickCountsExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "need at least one non-empty pattern")

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(StringType)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_ac_counts"

  private lazy val automaton = AhoCorasickCountsExpr.build(patterns)

  override protected def nullSafeEval(input: Any): Any =
    automaton.countsArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AhoCorasickCountsExpr.AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $acRef.countsArray($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): AhoCorasickCountsExpr =
    copy(child = newChild)
}

object AhoCorasickCountsExpr {

  /** Serializable trie + fail links + merged outputs. States are
    * dense ints; transitions are per-state sorted parallel arrays
    * (binary search) — compact to serialize, allocation-free to
    * walk, and immune to per-row hashing cost. */
  final class AcAutomaton private[functions] (
      transChars: Array[Array[Char]],
      transTo: Array[Array[Int]],
      fail: Array[Int],
      outs: Array[Array[Int]],
      patLens: Array[Int]) extends Serializable {

    private def step(fromState: Int, c: Char): Int = {
      var s = fromState
      while (true) {
        val idx = java.util.Arrays.binarySearch(transChars(s), c)
        if (idx >= 0) return transTo(s)(idx)
        if (s == 0) return 0
        s = fail(s)
      }
      0 // unreachable
    }

    /** Leftmost non-overlapping per-pattern counts (replace
      * semantics); one pass over the UTF-16 code units. */
    def counts(text: String): Array[Int] = {
      val n = patLens.length
      val out = new Array[Int](n)
      val nextAllowed = new Array[Int](n)
      var state = 0
      var i = 0
      val len = text.length
      while (i < len) {
        state = step(state, text.charAt(i))
        val ends = outs(state)
        var j = 0
        while (j < ends.length) {
          val p = ends(j)
          val start = i - patLens(p) + 1
          if (start >= nextAllowed(p)) {
            out(p) += 1
            nextAllowed(p) = i + 1
          }
          j += 1
        }
        i += 1
      }
      out
    }

    def countsArray(text: UTF8String): ArrayData =
      new GenericArrayData(counts(text.toString))
  }

  private[functions] def build(patterns: Seq[String]): AcAutomaton = {
    import scala.collection.mutable
    val goto = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val own = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = goto(s).getOrElseUpdate(c, {
          goto += mutable.HashMap.empty[Char, Int]
          own += mutable.ArrayBuffer.empty[Int]
          goto.length - 1
        })
      }
      own(s) += pi
    }
    val nStates = goto.length
    val fail = new Array[Int](nStates)
    val outs = new Array[Array[Int]](nStates)
    outs(0) = own(0).toArray
    val queue = mutable.Queue.empty[Int]
    goto(0).valuesIterator.foreach { s => fail(s) = 0; queue += s }
    // BFS: fail(child) = the deepest proper-suffix state; outputs
    // merge through the fail link so emission needs no chain walk.
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      outs(s) = (own(s) ++ outs(fail(s))).toArray
      goto(s).foreach { case (c, child) =>
        var f = fail(s)
        while (f != 0 && !goto(f).contains(c)) f = fail(f)
        fail(child) = goto(f).get(c).filter(_ != child).getOrElse(0)
        queue += child
      }
    }
    val transChars = new Array[Array[Char]](nStates)
    val transTo = new Array[Array[Int]](nStates)
    var s = 0
    while (s < nStates) {
      val sorted = goto(s).toArray.sortBy(_._1)
      transChars(s) = sorted.map(_._1)
      transTo(s) = sorted.map(_._2)
      if (outs(s) == null) outs(s) = own(s).toArray
      s += 1
    }
    new AcAutomaton(transChars, transTo, fail, outs,
      patterns.map(_.length).toArray)
  }
}

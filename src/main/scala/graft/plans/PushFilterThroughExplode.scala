package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.ArrayType

/** Optimizer rule: push a literal membership filter on an exploded
  * element THROUGH the explode, into an element-level `filter()` on
  * the array itself.
  *
  * `explode(tokens)` followed by `WHERE token IN ('a','b')` — the
  * shape of every query-term scan (BM25, targeted token stats) —
  * materializes one row PER ARRAY ELEMENT before the filter kills
  * almost all of them: the Generate output for a 1 000-token document
  * is 1 000 rows of (parent columns × element) even when 3 survive.
  * Rewritten to `explode(filter(tokens, x -> x IN ('a','b')))`, the
  * per-element work happens inside one expression over the unexploded
  * row and Generate only ever emits surviving elements — the
  * carried-parent-column duplication never exists.
  *
  * Fires only when provably safe:
  *  - inner explode (`outer = false`): `explode_outer` emits a
  *    null-element row for an emptied array, which the original plan
  *    would NOT produce — never rewritten;
  *  - the conjunct is `elem IN (literals)` / `elem = literal` with
  *    every literal non-null, referencing ONLY the exploded element
  *    (null elements drop on both paths: `IN` evaluates null →
  *    filtered; `filter()` drops null predicate results);
  *  - remaining conjuncts stay in place above the (now smaller)
  *    Generate, so mixed predicates still work.
  *
  * Registered by [[graft.functions.GraftExtensions]] via
  * `injectOptimizerRule` — the session-extension path a cluster
  * enables with `spark.sql.extensions`.
  */
object PushFilterThroughExplode extends Rule[LogicalPlan] with PredicateHelper {

  private def isPushable(e: Expression, elem: Attribute): Boolean = e match {
    case In(a: Attribute, list) =>
      a.semanticEquals(elem) && list.nonEmpty && list.forall {
        case Literal(v, _) => v != null
        case _ => false
      }
    case EqualTo(a: Attribute, Literal(v, _)) => a.semanticEquals(elem) && v != null
    case EqualTo(Literal(v, _), a: Attribute) => a.semanticEquals(elem) && v != null
    case _ => false
  }

  private def asElementPredicate(e: Expression, x: NamedLambdaVariable): Expression =
    e match {
      case In(_, list) => In(x, list)
      case EqualTo(_, l: Literal) => EqualTo(x, l)
      case EqualTo(l: Literal, _) => EqualTo(x, l)
      case other =>
        throw new IllegalStateException(s"unexpected pushable conjunct: $other")
    }

  /** Rewrite `Filter(cond, gen)` when `gen` is a pushable inner
    * explode; returns None when nothing pushes. */
  private def rewrite(cond: Expression, g: Generate,
                      wrap: LogicalPlan => LogicalPlan): Option[LogicalPlan] =
    g match {
      case Generate(Explode(arr), _, false, _, generatorOutput, _)
          if generatorOutput.size == 1 && arr.dataType.isInstanceOf[ArrayType] =>
        val elem = generatorOutput.head
        val (pushable, rest) =
          splitConjunctivePredicates(cond).partition(isPushable(_, elem))
        if (pushable.isEmpty) None
        else {
          val at = arr.dataType.asInstanceOf[ArrayType]
          val x = NamedLambdaVariable("x", at.elementType, at.containsNull)
          val pred = pushable.map(asElementPredicate(_, x)).reduce(And(_, _))
          val filtered = ArrayFilter(arr, LambdaFunction(pred, Seq(x)))
          val newGen = wrap(g.copy(generator = Explode(filtered)))
          Some(rest.reduceOption(And(_, _)).map(Filter(_, newGen)).getOrElse(newGen))
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // injected rules run after predicate pushdown, where the filter
    // sits directly on the Generate ...
    case f @ Filter(cond, g: Generate) =>
      rewrite(cond, g, identity).getOrElse(f)
    // ... but fresh analyzed plans still carry the analyzer's
    // pass-through Project; match through it when it keeps the
    // exploded element untouched
    case f @ Filter(cond, p @ Project(projList, g: Generate))
        if projList.forall(_.isInstanceOf[Attribute]) =>
      rewrite(cond, g, ng => p.copy(child = ng)).getOrElse(f)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt rule extraction for one user agent — the fetch-
  * permission stage of the crawl front door (REP / RFC 9309
  * semantics over the common subset): parse the group structure and
  * return THIS agent's applicable rules in document order, as
  * `array<struct<allow, prefix>>`. Rule EVALUATION (longest-match
  * gating over a URL) is a separate in-row fold in
  * [[graft.operators.Extract.robotsGate]] — parse once per
  * (domain, robots.txt) row, evaluate per URL.
  *
  * Deterministic parse contract (the published-subset state machine;
  * specs replay it):
  *  - lines split on '\n', a trailing '\r' stripped (CRLF files);
  *    `#` starts a comment to end of line;
  *  - a directive is `name: value` with the name matched
  *    case-insensitively (`User-agent`, `Allow`, `Disallow`; anything
  *    else — Crawl-delay, Sitemap — is ignored);
  *  - GROUPS: one or more consecutive `User-agent` lines open a
  *    group; the rules that follow belong to every named agent; a
  *    `User-agent` line appearing after rules starts a NEW group;
  *  - agent names match case-insensitively and exactly (`*` is the
  *    wildcard group); if any group names this agent, the agent's
  *    rules are the union of THOSE groups in document order and the
  *    `*` groups are ignored (the REP specificity rule), otherwise
  *    the `*` groups apply;
  *  - an EMPTY `Disallow:` (or `Allow:`) value contributes no rule —
  *    the classic "allow everything" idiom;
  *  - path wildcards (`*`, `$`) are NOT interpreted (out of this
  *    slice's scope, like the PSL wildcard rules) — prefixes match
  *    literally.
  */
case class RobotsRulesExpr(child: Expression, agent: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(agent.nonEmpty && agent != "*",
    "agent must be a concrete user-agent token")

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(StringType)

  override def nullable: Boolean = true

  override def dataType: DataType = RobotsRulesExpr.outType

  override def prettyName: String = "graft_robots_rules"

  override protected def nullSafeEval(input: Any): Any =
    RobotsRulesExpr.rules(input.asInstanceOf[UTF8String], agent)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val agentRef = ctx.addReferenceObj("agent", agent, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RobotsRulesExpr.rules($c, $agentRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): RobotsRulesExpr =
    copy(child = newChild)
}

object RobotsRulesExpr {

  val outType: ArrayType = ArrayType(StructType(Seq(
    StructField("allow", BooleanType, nullable = false),
    StructField("prefix", StringType, nullable = false))),
    containsNull = false)

  private final case class Group(
      agents: scala.collection.mutable.ArrayBuffer[String],
      rules: scala.collection.mutable.ArrayBuffer[(Boolean, String)])

  /** The parse kernel (static so codegen emits one call). */
  def rules(txt: UTF8String, agent: String): ArrayData = {
    val target = agent.toLowerCase(java.util.Locale.ROOT)
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var cur: Group = null
    var inAgentRun = false
    txt.toString.split('\n').foreach { raw =>
      val noCr = if (raw.nonEmpty && raw.last == '\r') raw.dropRight(1) else raw
      val hash = noCr.indexOf('#')
      val line = (if (hash >= 0) noCr.substring(0, hash) else noCr).trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val name = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        name match {
          case "user-agent" =>
            if (!inAgentRun) {
              cur = Group(scala.collection.mutable.ArrayBuffer.empty,
                scala.collection.mutable.ArrayBuffer.empty)
              groups += cur
              inAgentRun = true
            }
            if (value.nonEmpty)
              cur.agents += value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" =>
            inAgentRun = false
            if (cur != null && value.nonEmpty)
              cur.rules += ((name == "allow", value))
          case _ => inAgentRun = false // Crawl-delay, Sitemap, ...
        }
      }
    }
    val named = groups.filter(_.agents.contains(target))
    val chosen = if (named.nonEmpty) named else groups.filter(_.agents.contains("*"))
    val out = chosen.flatMap(_.rules).map { case (allow, prefix) =>
      InternalRow(allow, UTF8String.fromString(prefix)): AnyRef
    }
    new GenericArrayData(out.toArray)
  }
}

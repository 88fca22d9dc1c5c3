package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML outlink extraction: the `href` values of `<a>` tags in
  * document order — the crawl-frontier half of the raw-markup stage
  * ([[HtmlBlocksExpr]] yields the content; this yields the edges a
  * crawler follows and the outlink graph curation rules score). One
  * pass per row, pure projection, no shuffle.
  *
  * Deterministic parse contract (shares [[HtmlBlocksExpr]]'s tag
  * scan semantics exactly — comments, CDATA, script/style raw
  * content, doctype/PI are all skipped, so a `<a href=...>` inside
  * any of them never counts; an unterminated tag drops the rest):
  *  - every NON-closing `a` tag (self-closing included) with an
  *    `href` attribute contributes one element; tags without `href`
  *    contribute nothing;
  *  - attribute names match case-insensitively; the first `href`
  *    in a tag wins;
  *  - values may be single-/double-quoted (may then contain `>`,
  *    whitespace, `/`) or unquoted (ends at whitespace or `>`);
  *  - entities decode inside the value (`&amp;` in query strings —
  *    the table/numeric rules of [[HtmlBlocksExpr.decodeEntities]]);
  *  - no URL resolution or normalization here — that is
  *    [[graft.operators.UrlOps]]'s job downstream.
  */
case class HtmlLinksExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(StringType)

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_html_links"

  override protected def nullSafeEval(input: Any): Any =
    HtmlLinksExpr.links(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlLinksExpr.links($c);")

  override protected def withNewChildInternal(newChild: Expression): HtmlLinksExpr =
    copy(child = newChild)
}

object HtmlLinksExpr {
  import HtmlBlocksExpr.{decodeEntities, indexOfIgnoreCase, isAsciiLetter, isNameChar}

  /** The scan kernel (static so codegen emits one call). */
  def links(html: UTF8String): ArrayData = {
    val s = html.toString
    val n = s.length
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4); i = if (e < 0) n else e + 3
        } else if (s.startsWith("<![CDATA[", i)) {
          val e = s.indexOf("]]>", i + 9); i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (isAsciiLetter(s.charAt(i + 1)) ||
            (s.charAt(i + 1) == '/' && i + 2 < n && isAsciiLetter(s.charAt(i + 2))))) {
          val closing = s.charAt(i + 1) == '/'
          var j = i + (if (closing) 2 else 1)
          val ns = j
          while (j < n && isNameChar(s.charAt(j))) j += 1
          val name = s.substring(ns, j).toLowerCase(java.util.Locale.ROOT)
          var href: String = null
          var closed = false
          var lastWasSlash = false
          while (j < n && !closed) {
            val cj = s.charAt(j)
            if (cj == '>') { closed = true; j += 1 }
            else if (Character.isWhitespace(cj)) j += 1
            else if (cj == '/') { lastWasSlash = true; j += 1 }
            else {
              lastWasSlash = false
              // attribute name
              val as = j
              while (j < n && s.charAt(j) != '=' && s.charAt(j) != '>' &&
                s.charAt(j) != '/' && !Character.isWhitespace(s.charAt(j))) j += 1
              val aname = s.substring(as, j).toLowerCase(java.util.Locale.ROOT)
              while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
              var value: String = null
              if (j < n && s.charAt(j) == '=') {
                j += 1
                while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
                if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
                  val q = s.charAt(j); j += 1
                  val vs = j
                  while (j < n && s.charAt(j) != q) j += 1
                  value = s.substring(vs, j)
                  if (j < n) j += 1 // closing quote
                } else {
                  val vs = j
                  while (j < n && !Character.isWhitespace(s.charAt(j)) &&
                    s.charAt(j) != '>') j += 1
                  value = s.substring(vs, j)
                }
              }
              if (!closing && name == "a" && aname == "href" &&
                href == null && value != null) href = value
            }
          }
          if (!closed) i = n // unterminated tag: rest of doc dropped
          else {
            i = j
            // raw-content skip matches HtmlBlocksExpr: self-closing
            // script/style has no raw content
            if (!closing && !lastWasSlash &&
                (name == "script" || name == "style")) {
              val e = indexOfIgnoreCase(s, "</" + name, i)
              if (e < 0) i = n
              else { val g = s.indexOf('>', e); i = if (g < 0) n else g + 1 }
            }
            if (!closing && name == "a" && href != null)
              out.add(UTF8String.fromString(decodeEntities(href)))
          }
        } else if (s.startsWith("<!", i) || s.startsWith("<?", i)) {
          val e = s.indexOf('>', i); i = if (e < 0) n else e + 1
        } else i += 1
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

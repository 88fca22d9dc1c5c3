package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML outlink extraction WITH anchor text: `(href, anchor)` pairs
  * of `<a href=...>` tags in document order — the link-description
  * signal a web corpus aggregates per target ("what the linking web
  * says this page is"), the classic search/ranking feature beside
  * the q238 href-only frontier. One pass per row, pure projection.
  *
  * Shares [[HtmlLinksExpr]]'s tag-scan semantics exactly (comments,
  * CDATA, script/style raw content, doctype/PI skipped; unterminated
  * tag drops the rest; first `href` per tag wins; entities decode in
  * the href) and emits the SAME tags in the same order, so a
  * `posexplode` of this array aligns index-for-index with q238's
  * `link_idx`. Anchor-capture contract:
  *  - capture opens at an `a` tag WITH `href` and closes at the next
  *    `</a>`, at the next opening `a` tag (nested anchors are invalid
  *    HTML — a new `a` supersedes), or at end of input;
  *  - inner tags are stripped; text inside skipped regions
  *    (comments/CDATA/script/style) contributes nothing;
  *  - the captured text is entity-decoded at emit, then whitespace
  *    runs collapse to single spaces and the result is trimmed
  *    ([[HtmlBlocksExpr]]'s collapse rule). */
case class HtmlAnchorsExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(StringType)

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("href", StringType, nullable = false),
      StructField("anchor", StringType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_html_anchors"

  override protected def nullSafeEval(input: Any): Any =
    HtmlAnchorsExpr.anchors(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlAnchorsExpr.anchors($c);")

  override protected def withNewChildInternal(newChild: Expression): HtmlAnchorsExpr =
    copy(child = newChild)
}

object HtmlAnchorsExpr {
  import HtmlBlocksExpr.{decodeEntities, indexOfIgnoreCase, isAsciiLetter, isNameChar}

  private def collapse(raw: String): String = {
    val decoded = decodeEntities(raw)
    val out = new java.lang.StringBuilder(decoded.length)
    var pendingSpace = false
    var i = 0
    while (i < decoded.length) {
      val c = decoded.charAt(i)
      if (Character.isWhitespace(c)) pendingSpace = out.length > 0
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** The scan kernel (static so codegen emits one call). */
  def anchors(html: UTF8String): ArrayData = {
    val s = html.toString
    val n = s.length
    val out = new java.util.ArrayList[InternalRow]()
    var capHref: String = null
    val capBuf = new java.lang.StringBuilder()
    def emit(): Unit = {
      if (capHref != null) {
        out.add(new GenericInternalRow(Array[Any](
          UTF8String.fromString(decodeEntities(capHref)),
          UTF8String.fromString(collapse(capBuf.toString)))))
        capHref = null
        capBuf.setLength(0)
      }
    }
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
                  if (j < n) j += 1
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
            if (!closing && !lastWasSlash &&
                (name == "script" || name == "style")) {
              val e = indexOfIgnoreCase(s, "</" + name, i)
              if (e < 0) i = n
              else { val g = s.indexOf('>', e); i = if (g < 0) n else g + 1 }
            }
            if (name == "a") {
              // a new `a` open tag supersedes a pending capture; a
              // closing one finishes it; a SELF-CLOSING one
              // (`<a href="x"/>`) emits an empty anchor immediately —
              // following body text belongs to no link, and the row
              // stays index-aligned with HtmlLinksExpr
              emit()
              if (!closing && href != null) {
                capHref = href
                if (lastWasSlash) emit()
              }
            }
          }
        } else if (s.startsWith("<!", i) || s.startsWith("<?", i)) {
          val e = s.indexOf('>', i); i = if (e < 0) n else e + 1
        } else {
          if (capHref != null) capBuf.append(s.charAt(i))
          i += 1
        }
      } else {
        if (capHref != null) capBuf.append(s.charAt(i))
        i += 1
      }
    }
    emit() // EOF closes an open capture
    new GenericArrayData(out.toArray)
  }
}

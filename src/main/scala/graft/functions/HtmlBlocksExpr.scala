package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text-block segmentation: the raw-markup stage UPSTREAM of
  * every clean-text operator in the engine — published LLM corpora
  * (C4, RefinedWeb, Gopher) all start by stripping tags/scripts from
  * crawl HTML and segmenting what remains into blocks that the
  * jusText-style density rules then keep or drop
  * ([[graft.operators.Extract]] applies the rules; this expression
  * only parses). One pass over the markup per row, a pure projection
  * — no explode of the character stream, no shuffle.
  *
  * Output: `array<struct<text, n_chars, link_chars>>`, one element
  * per non-empty block in document order, where `text` is the
  * decoded block text with whitespace runs collapsed to single
  * spaces and trimmed, `n_chars` counts its NON-whitespace
  * codepoints, and `link_chars` counts the non-whitespace codepoints
  * that were emitted inside an `<a>` element — the numerator of the
  * classic link-density boilerplate rule.
  *
  * Deterministic parse contract (what specs and oracles replay —
  * a fixed state machine, not a lenient browser):
  *  - `<!-- ... -->` comments are dropped (tags inside them inert);
  *    an unterminated comment drops the rest of the document;
  *  - `<![CDATA[ ... ]]>` content is emitted VERBATIM (no entity
  *    decoding); unterminated CDATA emits to end of document;
  *  - `<script>`/`<style>` raw content is dropped up to the first
  *    case-insensitive `</script` / `</style` (then to the next
  *    `>`); unterminated raw content drops the rest;
  *  - a tag opens only at `<letter` or `</letter`; any other `<`
  *    (e.g. `1 < 2`) is literal text. Tag names are ASCII
  *    letters/digits, matched case-insensitively. The attribute
  *    scan honors single/double quotes, so `>` inside a quoted
  *    attribute value does not close the tag; a tag with no closing
  *    `>` drops the rest of the document. A `/` as the last
  *    significant char before `>` marks the tag self-closing;
  *  - `<!DOCTYPE ...>` / `<? ... ?>` skip to the next `>`;
  *  - block boundaries fire on BOTH the open and close of the
  *    block-level tags (html/head/body/title/p/div/br/hr/li/ul/ol/
  *    h1-h6/table/tr/td/th/thead/tbody/tfoot/caption/nav/header/
  *    footer/section/article/aside/main/blockquote/pre/form/dl/dt/
  *    dd/figure/figcaption/fieldset/option/select/address); inline
  *    tags (a, b, i, span, ...) do not split text;
  *  - entities decode in text only: the named table (amp lt gt quot
  *    apos nbsp — nbsp to a regular space), `&#NNN;` decimal and
  *    `&#xHH;` hex (codepoints validated: 0 < cp ≤ 0x10FFFF, not a
  *    surrogate). Anything else (`&copy;`, unterminated `&`,
  *    overflow) stays literal;
  *  - `<a>` nesting tracks a depth counter; a stray `</a>` clamps
  *    at zero; self-closing `<a/>` opens nothing.
  */
case class HtmlBlocksExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(StringType)

  override def nullable: Boolean = true

  override def dataType: DataType = HtmlBlocksExpr.outType

  override def prettyName: String = "graft_html_blocks"

  override protected def nullSafeEval(input: Any): Any =
    HtmlBlocksExpr.blocks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlBlocksExpr.blocks($c);")

  override protected def withNewChildInternal(newChild: Expression): HtmlBlocksExpr =
    copy(child = newChild)
}

object HtmlBlocksExpr {

  val outType: ArrayType = ArrayType(StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("link_chars", LongType, nullable = false))),
    containsNull = false)

  private val blockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("html", "head", "body", "title", "p", "div", "br", "hr", "li",
      "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6", "table", "tr",
      "td", "th", "thead", "tbody", "tfoot", "caption", "nav", "header",
      "footer", "section", "article", "aside", "main", "blockquote",
      "pre", "form", "dl", "dt", "dd", "figure", "figcaption",
      "fieldset", "option", "select", "address").foreach(s.add)
    s
  }

  private val namedEntities: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    m.put("amp", '&'.toInt); m.put("lt", '<'.toInt); m.put("gt", '>'.toInt)
    m.put("quot", '"'.toInt); m.put("apos", '\''.toInt)
    m.put("nbsp", ' '.toInt)
    m
  }

  private[functions] def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private[functions] def isNameChar(c: Char): Boolean =
    isAsciiLetter(c) || (c >= '0' && c <= '9')

  /** Entity parse at `s(i) == '&'`: returns `(codepoint << 32) | next`
    * or -1 when not a valid entity (shared by the block parser and
    * [[HtmlLinksExpr]]'s attribute-value decoding). */
  private[functions] def entityAt(s: String, i: Int): Long = {
    val n = s.length
    if (i + 1 >= n) return -1L
    var j = i + 1
    var cp = -1
    if (s.charAt(j) == '#') {
      j += 1
      var v = 0L
      var digits = 0
      if (j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) {
        j += 1
        while (j < n && digits < 7 && Character.digit(s.charAt(j), 16) >= 0) {
          v = v * 16 + Character.digit(s.charAt(j), 16); j += 1; digits += 1
        }
      } else {
        while (j < n && digits < 8 && s.charAt(j) >= '0' && s.charAt(j) <= '9') {
          v = v * 10 + (s.charAt(j) - '0'); j += 1; digits += 1
        }
      }
      if (digits == 0 || j >= n || s.charAt(j) != ';') return -1L
      if (v <= 0 || v > 0x10FFFFL || (v >= 0xD800L && v <= 0xDFFFL)) return -1L
      cp = v.toInt
    } else {
      val ns = j
      while (j < n && j - ns < 8 && isAsciiLetter(s.charAt(j))) j += 1
      if (j >= n || s.charAt(j) != ';') return -1L
      val hit = namedEntities.get(s.substring(ns, j))
      if (hit == null) return -1L
      cp = hit.intValue()
    }
    (cp.toLong << 32) | (j + 1).toLong
  }

  /** Decode the entity table over a raw string (attribute values —
    * the `&amp;` in query strings). Same rules as the text path. */
  private[functions] def decodeEntities(raw: String): String = {
    if (raw.indexOf('&') < 0) return raw
    val out = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '&') {
        val r = entityAt(raw, i)
        if (r < 0) { out.append('&'); i += 1 }
        else { out.appendCodePoint((r >>> 32).toInt); i = (r & 0xFFFFFFFFL).toInt }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Case-insensitive indexOf for the raw-text close-tag scan (ASCII
    * needles only). */
  private[functions] def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length - needle.length
    var i = math.max(from, 0)
    while (i <= n) {
      var j = 0
      while (j < needle.length &&
        Character.toLowerCase(s.charAt(i + j)) == needle.charAt(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** The parse kernel (static so codegen emits one call). */
  def blocks(html: UTF8String): ArrayData = {
    val s = html.toString
    val n = s.length
    val out = new java.util.ArrayList[AnyRef]()
    val cur = new java.lang.StringBuilder()
    var curNonWs = 0L
    var curLink = 0L
    var linkDepth = 0

    def emitCp(cp: Int): Unit = {
      cur.appendCodePoint(cp)
      if (!Character.isWhitespace(cp)) {
        curNonWs += 1
        if (linkDepth > 0) curLink += 1
      }
    }

    def flush(): Unit = {
      if (curNonWs > 0) {
        // collapse whitespace runs to single spaces, trim
        val collapsed = new java.lang.StringBuilder(cur.length)
        var i = 0
        var pendingSpace = false
        while (i < cur.length) {
          val c = cur.charAt(i)
          if (Character.isWhitespace(c)) pendingSpace = collapsed.length > 0
          else {
            if (pendingSpace) { collapsed.append(' '); pendingSpace = false }
            collapsed.append(c)
          }
          i += 1
        }
        out.add(InternalRow(
          UTF8String.fromString(collapsed.toString), curNonWs, curLink))
      }
      cur.setLength(0); curNonWs = 0L; curLink = 0L
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (s.startsWith("<![CDATA[", i)) {
          val e = s.indexOf("]]>", i + 9)
          val end = if (e < 0) n else e
          var k = i + 9
          while (k < end) {
            val cp = s.codePointAt(k)
            emitCp(cp); k += Character.charCount(cp)
          }
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (isAsciiLetter(s.charAt(i + 1)) ||
            (s.charAt(i + 1) == '/' && i + 2 < n && isAsciiLetter(s.charAt(i + 2))))) {
          val closing = s.charAt(i + 1) == '/'
          var j = i + (if (closing) 2 else 1)
          val ns = j
          while (j < n && isNameChar(s.charAt(j))) j += 1
          val name = s.substring(ns, j).toLowerCase(java.util.Locale.ROOT)
          // attribute scan: quotes guard '>', last significant char
          // '/' marks self-closing
          var quote: Char = 0
          var lastSig: Char = 0
          var closed = false
          while (j < n && !closed) {
            val cj = s.charAt(j)
            if (quote != 0) { if (cj == quote) quote = 0 }
            else if (cj == '"' || cj == '\'') quote = cj
            else if (cj == '>') closed = true
            else if (!Character.isWhitespace(cj)) lastSig = cj
            j += 1
          }
          if (!closed) i = n // unterminated tag: rest of doc dropped
          else {
            i = j
            val selfClose = lastSig == '/'
            if (!closing && !selfClose && (name == "script" || name == "style")) {
              val e = indexOfIgnoreCase(s, "</" + name, i)
              if (e < 0) i = n
              else { val g = s.indexOf('>', e); i = if (g < 0) n else g + 1 }
            }
            if (blockTags.contains(name)) flush()
            if (name == "a") {
              if (closing) linkDepth = math.max(0, linkDepth - 1)
              else if (!selfClose) linkDepth += 1
            }
          }
        } else if (s.startsWith("<!", i) || s.startsWith("<?", i)) {
          val e = s.indexOf('>', i)
          i = if (e < 0) n else e + 1
        } else { emitCp('<'); i += 1 }
      } else if (c == '&') {
        val r = entityAt(s, i)
        if (r < 0) { emitCp('&'); i += 1 }
        else { emitCp((r >>> 32).toInt); i = (r & 0xFFFFFFFFL).toInt }
      } else {
        val cp = s.codePointAt(i)
        emitCp(cp); i += Character.charCount(cp)
      }
    }
    flush()
    new GenericArrayData(out.toArray)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction — the mandatory stage between raw-crawl ingest
  * (`warc_records`' `http_body`) and every text operator (Gopher quality,
  * paragraph/span dedup, language ID, DSIR). One native codegen'd
  * expression, one pass over the bytes; no parser library, no DOM — at
  * corpus scale the extraction must stream through a projection, not
  * build trees.
  *
  * Extraction contract (deterministic, fixture-oracleable):
  *   1. comments `<!-- … -->` are dropped (unterminated: to end of input);
  *   2. `<script>`, `<style>`, `<noscript>`, `<template>` elements are
  *      dropped WITH their content, case-insensitive, attributes allowed,
  *      closed by the first matching `</tag` (unterminated: to end);
  *   3. every other tag `<… >` is replaced by a newline if its name is a
  *      BLOCK element (p, div, li, h1–h6, tr/td/th, br, html/head/body/
  *      title, … — the full set in [[HtmlTextParser.BlockTags]]) and by
  *      nothing if inline (a, span, b, em, …). A tag ends at the first
  *      `>`; a `<` not opening a tag (`1 < 2`) is literal text;
  *   4. character references decode: decimal `&#78;`, hex `&#x4E;`, and
  *      the named set in [[HtmlTextParser.NamedEntities]] (`&nbsp;` → a
  *      plain space); an unrecognized or malformed reference stays
  *      literal;
  *   5. whitespace normalizes: SOURCE newlines are ordinary whitespace
  *      (HTML renders them as spaces outside `pre`); only BLOCK-tag
  *      boundaries break lines. Within a line, whitespace runs collapse
  *      to one space and ends trim; empty lines drop; survivors join
  *      with `\n` — block structure becomes exactly one newline per
  *      boundary, the shape the Gopher line signals expect. Source NULs
  *      (invalid in HTML text) are removed.
  *
  * NULL in → NULL out; the empty string (or markup-only input) yields ''.
  */
case class HtmlText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"html_text requires string, got $other")
  }

  override protected def nullSafeEval(h: Any): Any =
    UTF8String.fromString(
      HtmlTextParser.extract(h.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.HtmlTextParser.extract($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlTextParser {

  /** Elements whose boundaries break lines. HTML5 block-level set plus
    * the document skeleton (html/head/body/title) and table/list innards
    * — each cell and item lands on its own line. */
  val BlockTags: Set[String] = Set(
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "details", "dir", "div", "dl", "dt", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "head", "header", "hr", "html", "li", "main", "menu", "nav", "ol",
    "p", "pre", "section", "summary", "table", "tbody", "td", "tfoot",
    "th", "thead", "title", "tr", "ul")

  /** Elements dropped WITH their content. */
  private val DropTags = Seq("script", "style", "noscript", "template")

  /** The named character references this extractor decodes — the core
    * structural set plus common typography; anything else stays literal
    * (lossless for downstream dedup keys). `nbsp` decodes to a PLAIN
    * space: U+00A0 would survive whitespace collapse and poison
    * whitespace-tokenized word counts. */
  val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "middot" -> "·",
    "deg" -> "°", "laquo" -> "«", "raquo" -> "»",
    "times" -> "×", "shy" -> "")

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** Case-insensitive "does `s` contain `needle` (lowercase) at i". */
  private def matchesAt(s: String, i: Int, needle: String): Boolean = {
    if (i + needle.length > s.length) return false
    var j = 0
    while (j < needle.length) {
      if (Character.toLowerCase(s.charAt(i + j)) != needle.charAt(j)) return false
      j += 1
    }
    true
  }

  def extract(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (matchesAt(html, i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          // content-dropping element? (name must end at a non-letter so
          // <scripty> is an ordinary tag)
          val drop = DropTags.find { t =>
            matchesAt(html, i, "<" + t) && {
              val after = i + 1 + t.length
              after >= n || !isAsciiLetter(html.charAt(after))
            }
          }
          drop match {
            case Some(t) =>
              // skip to the matching close tag's '>'
              var e = i + 1 + t.length
              var end = -1
              while (end < 0 && e < n) {
                if (html.charAt(e) == '<' && matchesAt(html, e, "</" + t)) {
                  val gt = html.indexOf('>', e)
                  end = if (gt < 0) n else gt + 1
                } else e += 1
              }
              i = if (end < 0) n else end
            case None =>
              val nxt = if (i + 1 < n) html.charAt(i + 1) else ' '
              if (isAsciiLetter(nxt) || nxt == '/' || nxt == '!' || nxt == '?') {
                val gt = html.indexOf('>', i + 1)
                val tagEnd = if (gt < 0) n else gt
                // tag name: letters after optional '/'
                var p = i + 1
                if (p < tagEnd && (html.charAt(p) == '/' || html.charAt(p) == '!' || html.charAt(p) == '?')) p += 1
                val nameStart = p
                while (p < tagEnd && (isAsciiLetter(html.charAt(p)) ||
                    (html.charAt(p) >= '0' && html.charAt(p) <= '9'))) p += 1
                val name = html.substring(nameStart, p).toLowerCase(java.util.Locale.ROOT)
                if (BlockTags.contains(name)) out.append('\u0000') // block-break sentinel: NUL is invalid in HTML text
                i = if (gt < 0) n else gt + 1
              } else { out.append(c); i += 1 } // literal '<' (e.g. "1 < 2")
          }
        }
      } else if (c == '&') {
        // character reference: &#123; | &#x7B; | &name; — else literal
        var decoded = false
        if (i + 1 < n && html.charAt(i + 1) == '#') {
          val hexMode = i + 2 < n && (html.charAt(i + 2) == 'x' || html.charAt(i + 2) == 'X')
          var p = i + (if (hexMode) 3 else 2)
          var cp = 0L
          val digStart = p
          while (p < n && p - digStart < 7 && {
            val d = Character.digit(html.charAt(p), if (hexMode) 16 else 10)
            if (d >= 0) { cp = cp * (if (hexMode) 16 else 10) + d; true } else false
          }) p += 1
          if (p > digStart && p < n && html.charAt(p) == ';' &&
              cp > 0 && cp <= 0x10ffffL && !(cp >= 0xd800L && cp <= 0xdfffL)) {
            out.appendCodePoint(cp.toInt); i = p + 1; decoded = true
          }
        } else {
          var p = i + 1
          while (p < n && p - i <= 10 && isAsciiLetter(html.charAt(p))) p += 1
          if (p < n && html.charAt(p) == ';') {
            NamedEntities.get(html.substring(i + 1, p)) match {
              case Some(rep) => out.append(rep); i = p + 1; decoded = true
              case None => ()
            }
          }
        }
        if (!decoded) { out.append(c); i += 1 }
      } else {
        if (c != '\u0000') out.append(c) // source NULs removed (invalid in HTML)
        i += 1
      }
    }
    normalize(out)
  }

  /** Collapse intra-line whitespace (incl. SOURCE newlines — whitespace in
    * HTML), trim lines, drop empties, break lines only at the block-tag
    * NUL sentinels, join '\n'. */
  private def normalize(sb: java.lang.StringBuilder): String = {
    val out = new java.lang.StringBuilder(sb.length)
    var i = 0
    val n = sb.length
    var lineHasText = false // emitted anything on the current output line
    var pendingSpace = false
    var pendingNewline = false
    while (i < n) {
      val c = sb.charAt(i)
      if (c == '\u0000') { pendingNewline = true; pendingSpace = false }
      else if (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == 0x0b) {
        pendingSpace = true
      } else {
        if (pendingNewline) {
          if (lineHasText) out.append('\n')
          lineHasText = false; pendingNewline = false; pendingSpace = false
        }
        if (pendingSpace && lineHasText) out.append(' ')
        pendingSpace = false
        out.append(c)
        lineHasText = true
      }
      i += 1
    }
    out.toString
  }
}

object HtmlFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `html_text(html)` as a Column. */
  def htmlText(html: Column): Column =
    ColumnBridge.column(HtmlText(ColumnBridge.expression(html)))
}

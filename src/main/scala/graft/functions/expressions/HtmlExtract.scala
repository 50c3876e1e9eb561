package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML main-text extraction as a native Catalyst expression — the first
  * operator of every crawl-to-corpus pipeline (boilerplate stripping must
  * run on raw crawl bytes BEFORE any dedup/quality/language stage, so it
  * has to be cheap, deterministic, and inside codegen).
  *
  * One linear scan per document, no DOM, no regex — and the scan is
  * hardened for REAL crawl bytes, not just normalized HTML:
  *  - `<script>`/`<style>` elements are skipped wholesale (content and
  *    tags); tag names match CASE-INSENSITIVELY (`</SCRIPT>`,
  *    `</Style >` with whitespace before `>` both close), and an
  *    unterminated raw-text element swallows to EOF (the HTML5 rule);
  *  - tag scanning is QUOTE-AWARE: a `>` inside a quoted attribute value
  *    (`<a href="a>b">`, inline onclick handlers) does not end the tag;
  *  - every other tag is stripped and treated as a WHITESPACE separator
  *    (block/inline distinction collapses under whitespace folding);
  *  - entities decode: the full Latin-1/punctuation named set below
  *    (`&amp; &mdash; &euro; ...`), decimal `&#NN;` and hex `&#xNN;`
  *    (code points above U+10FFFF and surrogates rejected); unknown
  *    entities pass through literally;
  *  - whitespace (incl. decoded nbsp) collapses to single spaces, trimmed.
  *
  * Besides the text it returns link statistics — `n_links` (anchor count)
  * and `link_chars` (non-space text chars inside anchors) — the classic
  * link-density boilerplate signal, measured in the same pass.
  *
  * Returns struct(text STRING, n_links INT, link_chars INT); null in,
  * null out.
  */
case class HtmlExtract(child: Expression) extends UnaryExpression {

  override def dataType: DataType = HtmlExtract.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_extract requires STRING html, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(v: Any): Any =
    HtmlExtract.extract(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.HtmlExtract.extract($c);")

  override protected def withNewChildInternal(newChild: Expression): HtmlExtract =
    copy(child = newChild)

  override def prettyName: String = "html_extract"
}

object HtmlExtract {

  val schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_links", IntegerType, nullable = false),
    StructField("link_chars", IntegerType, nullable = false)))

  /** Column API. */
  def htmlExtract(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(HtmlExtract(GraftColumnBridge.expression(c.cast("string"))))
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Named entities (case-sensitive, per the HTML spec): the core XML
    * five plus the Latin-1 + general-punctuation set that dominates real
    * crawl text. Unknown names pass through literally. */
  private val entities: Map[String, Int] = Map(
    "amp" -> '&', "lt" -> '<', "gt" -> '>', "quot" -> '"', "apos" -> '\'',
    "nbsp" -> ' ',
    // general punctuation
    "ndash" -> 0x2013, "mdash" -> 0x2014, "hellip" -> 0x2026,
    "lsquo" -> 0x2018, "rsquo" -> 0x2019, "sbquo" -> 0x201A,
    "ldquo" -> 0x201C, "rdquo" -> 0x201D, "bdquo" -> 0x201E,
    "dagger" -> 0x2020, "Dagger" -> 0x2021, "bull" -> 0x2022,
    "permil" -> 0x2030, "lsaquo" -> 0x2039, "rsaquo" -> 0x203A,
    "prime" -> 0x2032, "Prime" -> 0x2033, "minus" -> 0x2212,
    "trade" -> 0x2122, "euro" -> 0x20AC,
    // Latin-1 supplement
    "iexcl" -> 0xA1, "cent" -> 0xA2, "pound" -> 0xA3, "curren" -> 0xA4,
    "yen" -> 0xA5, "brvbar" -> 0xA6, "sect" -> 0xA7, "uml" -> 0xA8,
    "copy" -> 0xA9, "ordf" -> 0xAA, "laquo" -> 0xAB, "not" -> 0xAC,
    "shy" -> 0xAD, "reg" -> 0xAE, "macr" -> 0xAF, "deg" -> 0xB0,
    "plusmn" -> 0xB1, "sup2" -> 0xB2, "sup3" -> 0xB3, "acute" -> 0xB4,
    "micro" -> 0xB5, "para" -> 0xB6, "middot" -> 0xB7, "cedil" -> 0xB8,
    "sup1" -> 0xB9, "ordm" -> 0xBA, "raquo" -> 0xBB, "frac14" -> 0xBC,
    "frac12" -> 0xBD, "frac34" -> 0xBE, "iquest" -> 0xBF,
    "times" -> 0xD7, "divide" -> 0xF7, "szlig" -> 0xDF,
    "agrave" -> 0xE0, "aacute" -> 0xE1, "acirc" -> 0xE2, "atilde" -> 0xE3,
    "auml" -> 0xE4, "aring" -> 0xE5, "aelig" -> 0xE6, "ccedil" -> 0xE7,
    "egrave" -> 0xE8, "eacute" -> 0xE9, "ecirc" -> 0xEA, "euml" -> 0xEB,
    "igrave" -> 0xEC, "iacute" -> 0xED, "icirc" -> 0xEE, "iuml" -> 0xEF,
    "eth" -> 0xF0, "ntilde" -> 0xF1, "ograve" -> 0xF2, "oacute" -> 0xF3,
    "ocirc" -> 0xF4, "otilde" -> 0xF5, "ouml" -> 0xF6, "oslash" -> 0xF8,
    "ugrave" -> 0xF9, "uacute" -> 0xFA, "ucirc" -> 0xFB, "uuml" -> 0xFC,
    "yacute" -> 0xFD, "thorn" -> 0xFE, "yuml" -> 0xFF)

  /** The kernel — shared by interpreted eval and generated code. */
  def extract(u: UTF8String): InternalRow = {
    val s = u.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    var nLinks = 0
    var linkChars = 0
    var linkDepth = 0

    def appendChar(c: Char): Unit = {
      if (isWs(c)) pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
        if (linkDepth > 0) linkChars += 1
      }
    }

    /** Lowercase tag name starting at `from`; empty if not a letter. */
    def tagName(from: Int): String = {
      var j = from
      val b = new java.lang.StringBuilder(8)
      while (j < n && ((s.charAt(j) >= 'a' && s.charAt(j) <= 'z') ||
        (s.charAt(j) >= 'A' && s.charAt(j) <= 'Z'))) {
        b.append(Character.toLowerCase(s.charAt(j))); j += 1
      }
      b.toString
    }

    /** Index of the tag-ending '>' at/after `from`, skipping over quoted
      * attribute values — a '>' inside `href="a>b"` or an onclick handler
      * must not end the tag. -1 if the tag never closes. */
    def tagEnd(from: Int): Int = {
      var j = from
      var quote: Char = 0
      while (j < n) {
        val ch = s.charAt(j)
        if (quote != 0) { if (ch == quote) quote = 0 }
        else if (ch == '"' || ch == '\'') quote = ch
        else if (ch == '>') return j
        j += 1
      }
      // Reached EOF inside an unterminated quote (real crawl bytes:
      // <p style="color:red>) or a tag that never closes. A single
      // malformed tag must not erase the rest of the document, so fall
      // back to the quote-blind scan: worst case loses text up to one
      // '>', never to EOF. (-1 only when no '>' exists at all.)
      s.indexOf('>', from)
    }

    /** Index AFTER the case-insensitive close tag `</name [ws] >` at/after
      * `from`; n if absent (HTML5: unterminated raw text runs to EOF). */
    def closeTagEnd(name: String, from: Int): Int = {
      var j = from
      while (j >= 0 && j < n) {
        j = s.indexOf("</", j)
        if (j < 0) return n
        var k = j + 2
        var m = 0
        while (m < name.length && k < n &&
          Character.toLowerCase(s.charAt(k)) == name.charAt(m)) {
          k += 1; m += 1
        }
        if (m == name.length) {
          while (k < n && isWs(s.charAt(k))) k += 1
          if (k < n && s.charAt(k) == '>') return k + 1
        }
        j += 2
      }
      n
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          // comments skip to their own terminator, NOT the first '>' —
          // conditional comments and commented-out markup contain '>'
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val closing = i + 1 < n && s.charAt(i + 1) == '/'
          val name = tagName(if (closing) i + 2 else i + 1)
          if (!closing && (name == "script" || name == "style")) {
            // skip to the matching close tag wholesale (case-insensitive,
            // whitespace tolerated before '>'): first past the open tag
            // itself, then to the element's close tag
            val open = tagEnd(i + 1)
            i = closeTagEnd(name, if (open < 0) n else open + 1)
          } else {
            val gt = tagEnd(i + 1)
            // '<a .../>' self-closes: count the link but never open the
            // depth — an unclosed depth would tag the whole remaining
            // document as link text and saturate the density signal
            val selfClosing = gt > i && s.charAt(gt - 1) == '/'
            if (name == "a") {
              if (closing) { if (linkDepth > 0) linkDepth -= 1 }
              else {
                nLinks += 1
                // the open-anchor depth turns on AFTER the tag itself
                if (!selfClosing) linkDepth += 1
              }
            }
            i = if (gt < 0) n else gt + 1
          }
        }
        pendingSpace = true // every tag separates text runs
      } else if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val decoded: Int =
            if (ent.length > 1 && ent.charAt(0) == '#') {
              val body = ent.substring(1)
              // digit caps keep the parses overflow-safe (max valid code
              // point 0x10FFFF is 6 hex / 7 decimal digits)
              val cp =
                if ((body.charAt(0) == 'x' || body.charAt(0) == 'X') &&
                  body.length > 1 && body.length <= 7 &&
                  body.substring(1).forall(ch =>
                    (ch >= '0' && ch <= '9') || (ch >= 'a' && ch <= 'f') ||
                      (ch >= 'A' && ch <= 'F')))
                  java.lang.Integer.parseInt(body.substring(1), 16)
                else if (body.length <= 7 &&
                  body.forall(ch => ch >= '0' && ch <= '9'))
                  body.toInt
                else -1
              // reject beyond-Unicode and surrogate code points
              if (cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) -1 else cp
            } else entities.getOrElse(ent, -1)
          if (decoded >= 0) {
            if (decoded <= Char.MaxValue) appendChar(decoded.toChar)
            else Character.toChars(decoded).foreach(appendChar)
            i = semi + 1
          } else { appendChar('&'); i += 1 }
        } else { appendChar('&'); i += 1 }
      } else {
        appendChar(c); i += 1
      }
    }
    InternalRow(UTF8String.fromString(sb.toString), nLinks, linkChars)
  }
}

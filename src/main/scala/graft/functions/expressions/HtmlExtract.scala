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
  * One linear scan per document, no DOM, no regex:
  *  - `<script>`/`<style>` elements are skipped wholesale (content and
  *    tags; lowercase tag names — the normalized-crawl contract);
  *  - every other tag is stripped and treated as a WHITESPACE separator
  *    (block/inline distinction collapses under whitespace folding);
  *  - entities decode: `&amp; &lt; &gt; &quot; &apos; &nbsp;` and numeric
  *    `&#NN;`; unknown entities pass through literally;
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
            // skip to the matching close tag wholesale
            val end = s.indexOf(s"</$name>", i)
            i = if (end < 0) n else end + name.length + 3
          } else {
            val gt = s.indexOf('>', i)
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
        if (semi > i && semi - i <= 8) {
          val ent = s.substring(i + 1, semi)
          val decoded: Int = ent match {
            case "amp" => '&'
            case "lt" => '<'
            case "gt" => '>'
            case "quot" => '"'
            case "apos" => '\''
            case "nbsp" => ' '
            case _ if ent.startsWith("#") && ent.length > 1 &&
              ent.drop(1).forall(ch => ch >= '0' && ch <= '9') =>
              ent.drop(1).toInt
            case _ => -1
          }
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

package graft.functions

import graft.SparkSpec
import graft.functions.expressions.HtmlExtract
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Edge-case contract for the HtmlExtract scanner: q147's oracle covers the
  * well-formed wrapping formula; these pin the scanner's behavior on the
  * malformed input a real crawl delivers. */
class HtmlExtractSpec extends SparkSpec {

  private def run(html: String): (String, Int, Int) = {
    val r = HtmlExtract.extract(UTF8String.fromString(html))
    (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2))
  }

  test("strips tags, folds whitespace, decodes entities") {
    assert(run("<p>a  b</p><p>c</p>") == (("a b c", 0, 0)))
    assert(run("x&amp;y &lt;3&gt; &quot;q&quot; &apos;a&apos;&nbsp;z") ==
      (("x&y <3> \"q\" 'a' z", 0, 0)))
    assert(run("&#65;&#66; &#8364;") == (("AB \u20AC", 0, 0)))
  }

  test("script and style content is skipped wholesale, even with markup inside") {
    assert(run("a<script>if (x < 1) { y = '<p>no</p>'; }</script>b") == (("a b", 0, 0)))
    assert(run("a<style>p > span { color: red; }</style>b") == (("a b", 0, 0)))
    // unclosed script swallows the rest \u2014 the conservative reading
    assert(run("a<script>var x = 1;") == (("a", 0, 0)))
  }

  test("link statistics: counts anchors and their non-space text chars") {
    assert(run("""x <a href="u">click me</a> y <a>2nd</a>""") == (("x click me y 2nd", 2, 10)))
    // malformed: closing anchor with none open must not underflow
    assert(run("a</a>b<a>c") == (("a b c", 1, 1)))
  }

  test("comments skip to their own terminator, not the first '>'") {
    assert(run("a<!-- if x > 1 show banner -->b") == (("a b", 0, 0)))
    assert(run("a<!--[if lt IE 9]><p>old</p><![endif]-->b") == (("a b", 0, 0)))
    // unclosed comment swallows the rest, like an unclosed script
    assert(run("a<!-- never closed") == (("a", 0, 0)))
  }

  test("self-closing anchors count as links but never open the depth") {
    // an unclosed depth would tag the whole remaining document as link
    // text and saturate the density signal
    assert(run("""<a href="u"/>lots of article text""") ==
      (("lots of article text", 1, 0)))
    assert(run("""<a href="u"/>x<a>y</a>z""") == (("x y z", 2, 1)))
  }

  test("malformed input never throws: unclosed tags, bare ampersands, truncation") {
    assert(run("a<b") == (("a", 0, 0)))
    assert(run("fish & chips &unknown; &toolongentity123; x") ==
      (("fish & chips &unknown; &toolongentity123; x", 0, 0)))
    assert(run("") == (("", 0, 0)))
    assert(run("<>" ) == (("", 0, 0)))
  }

  test("a '>' inside a quoted attribute value does not end the tag") {
    assert(run("""a <a href="x>y">t</a> b""") == (("a t b", 1, 1)))
    assert(run("""a <img alt='5 > 3'> b""") == (("a b", 0, 0)))
    assert(run("""<div onclick="if (a>b) go()">x</div>""") == (("x", 0, 0)))
    // quote closes, then the real '>' ends the tag
    assert(run("""<span title="a>b" id=c>d</span>""") == (("d", 0, 0)))
  }

  test("an unterminated quote loses at most one tag, not the rest of the doc") {
    // real crawl bytes: the attribute quote never closes — the quote-aware
    // scan must fall back to the first '>' instead of eating to EOF
    assert(run("""a <p style="color:red> one two</p> three""") ==
      (("a one two three", 0, 0)))
    assert(run("""<a href="x>text</a> after""") == (("text after", 1, 4)))
    // unterminated quote AND no '>' at all: rest of tag dropped, no throw
    assert(run("""keep <img alt="oops""") == (("keep", 0, 0)))
  }

  test("raw-text close tags match case-insensitively with optional whitespace") {
    assert(run("a<SCRIPT>var x = 1;</SCRIPT>b") == (("a b", 0, 0)))
    assert(run("a<script>x</ScRiPt>b") == (("a b", 0, 0)))
    assert(run("a<style>p { color: red }</style >b") == (("a b", 0, 0)))
    // '</scripted>' is NOT a script close tag \u2014 scan continues to the real one
    assert(run("a<script>x</scripted>y</script>b") == (("a b", 0, 0)))
    // quoted '>' inside the open tag's attributes doesn't start the raw text
    assert(run("""a<script type="a>b">var x;</script>c""") == (("a c", 0, 0)))
  }

  test("hex and extended named entities decode; invalid code points stay literal") {
    assert(run("&#x41;&#X42; &#x20AC;") == (("AB \u20AC", 0, 0)))
    assert(run("em&mdash;dash &hellip; &copy;2024 caf&eacute;") ==
      (("em\u2014dash \u2026 \u00A92024 caf\u00E9", 0, 0)))
    // surrogates, beyond-Unicode, and overlong digit runs pass through
    assert(run("&#xD800; &#1114112; &#x110000;") ==
      (("&#xD800; &#1114112; &#x110000;", 0, 0)))
  }

  test("registered on the SQL surface as html_extract") {
    graft.plans.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT html_extract('<p>a</p><a href="u">b c</a>') AS x""")
      .select(col("x.text"), col("x.n_links"), col("x.link_chars"))
      .collect().head
    assert((r.getString(0), r.getInt(1), r.getInt(2)) == (("a b c", 1, 2)))
  }

  test("both eval paths agree through a real projection") {
    import spark.implicits._
    val html = """<html><body><h1>T</h1><a href="u">L 1</a>&nbsp;end</body></html>"""
    val viaDf = Seq(html).toDF("h")
      .select(HtmlExtract.htmlExtract(col("h")).as("x"))
      .select(col("x.text"), col("x.n_links"), col("x.link_chars"))
      .collect().head
    val direct = run(html)
    assert((viaDf.getString(0), viaDf.getInt(1), viaDf.getInt(2)) == direct)
    assert(direct == (("T L 1 end", 1, 2)))
  }
}

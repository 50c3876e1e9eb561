package graft.sources

import scala.xml.{Elem, Node, Text => XText}

/** Atom/XML feed parsing (S5, `lib/webhookdb/xml.rb:4-90`): feed XML ->
  * entry maps with namespace-prefixed keys (`georss:point`), link/category
  * elements parsed attribute-wise, `content` keeping raw inner XML — the
  * shapes `atom_single_feed_v1` ingests.
  *
  * Entries serialize to JSON webhook bodies so the feed flows through the
  * standard projection/merge pipeline unchanged.
  */
object AtomXml {

  private def fqn(n: Node): String =
    Option(n.prefix).filter(_.nonEmpty).map(p => s"$p:${n.label}").getOrElse(n.label)

  private def simpleText(n: Node): Boolean =
    n.child.forall(_.isInstanceOf[XText])

  private val SpecAttr = Set("link", "category")

  private def parseSpecAttr(e: Node): Map[String, String] = {
    val attrs = e.attributes.asAttrMap
    if (simpleText(e) && e.text.nonEmpty) attrs + ("text" -> e.text) else attrs
  }

  /** One `<entry>` element -> flat map (spec-attr elements become nested
    * maps; `content` keeps raw inner XML under "value"). Repeated child
    * elements (multiple `<link>`s) collapse LAST-WINS — deliberately
    * matching the reference's own parser, which assigns `h[fqn(c)]` per
    * child in a loop (`xml.rb` `parse_entry`), so replicated bodies stay
    * byte-compatible with what the reference stores. */
  def parseEntry(e: Node): Map[String, Any] =
    e.child.collect { case c: Elem => c }.map { c =>
      c.label match {
        case "content" =>
          val inner = c.child.mkString.trim
          val m = c.attributes.asAttrMap ++
            (if (inner.nonEmpty) Map("value" -> inner) else Map.empty)
          "content" -> m
        case l if SpecAttr.contains(l) => fqn(c) -> parseSpecAttr(c)
        case _ => fqn(c) -> c.text
      }
    }.toMap

  /** Whole feed -> (feed metadata, entries). */
  def parseFeed(xml: String): (Map[String, Any], Seq[Map[String, Any]]) = {
    val root = scala.xml.XML.loadString(xml)
    val children = root.child.collect { case c: Elem => c }
    val entries = children.filter(_.label == "entry").map(parseEntry)
    val meta = children.filterNot(_.label == "entry").map { c =>
      if (SpecAttr.contains(c.label)) fqn(c) -> parseSpecAttr(c)
      else if (simpleText(c)) fqn(c) -> c.text
      else fqn(c) -> c.child.collect { case cc: Elem => fqn(cc) -> cc.text }.toMap
    }.toMap
    (meta, entries)
  }

  /** Entries as JSON strings (webhook bodies for the atom replicator). */
  def entriesAsJson(xml: String): Seq[String] =
    parseFeed(xml)._2.map(renderJson)

  private def renderJson(m: Map[String, Any]): String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def render(v: Any): String = v match {
      case s: String => s""""${esc(s)}""""
      case mm: Map[_, _] =>
        mm.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
          .map { case (k, vv) => s""""${esc(k)}":${render(vv)}""" }
          .mkString("{", ",", "}")
      case other => s""""${esc(other.toString)}""""
    }
    render(m)
  }
}

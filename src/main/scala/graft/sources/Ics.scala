package graft.sources

/** Streaming iCalendar (RFC 5545) feed parser (S6,
  * `icalendar_calendar_v1.rb:655-698` + `icalendar_event_v1.rb:238-343`):
  * line-oriented so arbitrarily large feeds parse in one pass inside an
  * executor task (`mapPartitions`-friendly — no DOM, no full-file buffer).
  *
  * Behaviors preserved: continuation-line unfolding (leading whitespace),
  * BEGIN/END:VEVENT framing with nested-component skipping (depth > 1),
  * property parameters (`;TZID=...`), RFC 3.6.1 multi-occurrence keys as
  * arrays, backslash escape decoding.
  */
object Ics {

  /** One property line: value + parameters (e.g. TZID, VALUE=DATE). */
  final case class Entry(v: String, params: Map[String, String]) {
    def param(name: String): Option[String] = params.get(name)
  }

  /** A parsed VEVENT: property name -> entries (scalar keys have one). */
  type VEvent = Map[String, Seq[Entry]]

  val ArrayKeys: Set[String] = Set(
    "ATTACH", "ATTENDEE", "CATEGORIES", "COMMENT", "CONTACT", "EXDATE",
    "RSTATUS", "RELATED", "RESOURCES", "RDATE", "X-PROP", "IANA-PROP")

  /** Unfold continuation lines: a line starting with space/tab continues the
    * previous line (RFC 5545 §3.1). Streaming — O(1) lookahead. */
  def unfold(lines: Iterator[String]): Iterator[String] = new Iterator[String] {
    private val it = lines.buffered
    def hasNext: Boolean = it.hasNext
    def next(): String = {
      val sb = new StringBuilder(it.next())
      while (it.hasNext && (it.head.startsWith(" ") || it.head.startsWith("\t")))
        // Strips ALL leading whitespace, not the single fold char RFC 5545
        // §3.1 defines — DELIBERATELY matching the reference's
        // `_compact_vevent_lines` (`icalendar_event_v1.rb:244-245`:
        // `line.start_with?(/\s+/)` + `line.lstrip!`), so replicated rows
        // stay byte-compatible with what the reference stores for feeds
        // that fold mid-word.
        sb.append(it.next().replaceFirst("^\\s+", ""))
      sb.toString
    }
  }

  /** Frame unfolded lines into VEVENT blocks; content of nested components
    * (VALARM etc.) is skipped, matching `vevent_to_hash`'s depth rule. */
  def vevents(unfolded: Iterator[String]): Iterator[Seq[String]] = new Iterator[Seq[String]] {
    private var pending: Option[Seq[String]] = None
    private def advance(): Unit = {
      val buf = Seq.newBuilder[String]
      var inEvent = false
      var depth = 0
      while (pending.isEmpty && unfolded.hasNext) {
        val line = unfolded.next().stripTrailing()
        if (!inEvent) {
          if (line == "BEGIN:VEVENT") { inEvent = true; depth = 1 }
        } else if (line.startsWith("BEGIN:")) depth += 1
        else if (line == "END:VEVENT" && depth == 1) {
          pending = Some(buf.result()); inEvent = false
        } else if (line.startsWith("END:")) depth -= 1
        else if (depth == 1 && line.nonEmpty) buf += line
      }
    }
    def hasNext: Boolean = { if (pending.isEmpty) advance(); pending.nonEmpty }
    def next(): Seq[String] = {
      if (pending.isEmpty) advance()
      val r = pending.get; pending = None; r
    }
  }

  // All quantifiers possessive (*+/++): each character class excludes the
  // delimiter that follows it, so possessiveness cannot change what matches —
  // it only forbids backtracking. Without it, a hostile feed line (a long run
  // of `;a=,,,…` with no terminating `:`) triggers exponential backtracking
  // in java.util.regex — a DoS vector in a parser whose whole point (S6) is
  // surviving arbitrary external feeds.
  private val LineRe =
    """(?<name>[-a-zA-Z0-9]++)(?<params>(?:;[-a-zA-Z0-9]++=(?:"[^"]*+"|[^";:,]*+)(?:,(?:"[^"]*+"|[^";:,]*+))*+)*+):(?<value>.*)""".r
  private val ParamRe = """([-a-zA-Z0-9]++)=("[^"]*+"|[^";:,]*+)""".r

  /** Parse one unfolded property line into (name, Entry). */
  def parseLine(line: String): Option[(String, Entry)] = line match {
    case LineRe(name, params, value) =>
      val pm = ParamRe.findAllMatchIn(Option(params).getOrElse("")).map { m =>
        m.group(1) -> m.group(2).stripPrefix("\"").stripSuffix("\"")
      }.toMap
      // Sequential-replace unescape, DELIBERATELY the reference's own chain
      // (`icalendar_event_v1.rb:270-272`: gsub \r\n, \n, \t in that order —
      // it does not decode RFC 5545's '\\' or '\N', and the chain shares
      // the reference's behavior for pathological '\\n' sequences), plus
      // the '\,'/'\;' decodes the reference's _parse_line applies when
      // splitting list values. Byte-compatibility with the reference's
      // stored rows wins over RFC strictness here.
      val unescaped = value
        .replace("\\r\\n", "\r\n").replace("\\n", "\n")
        .replace("\\t", "\t").replace("\\,", ",").replace("\\;", ";")
      Some(name -> Entry(unescaped, pm))
    case _ => None
  }

  def veventToMap(lines: Seq[String]): VEvent = {
    var result = Map.empty[String, Seq[Entry]]
    lines.foreach { line =>
      parseLine(line).foreach { case (name, entry) =>
        if (ArrayKeys.contains(name))
          result = result.updated(name, result.getOrElse(name, Nil) :+ entry)
        else result = result.updated(name, Seq(entry))
      }
    }
    result
  }

  /** Parse a whole feed into VEVENT maps (streaming under the hood). */
  def parseFeed(text: String): Seq[VEvent] =
    vevents(unfold(text.linesIterator)).map(veventToMap).toSeq
}

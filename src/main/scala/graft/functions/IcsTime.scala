package graft.functions

import graft.sources.Ics
import java.time._
import java.time.format.DateTimeFormatter

/** ICS temporal semantics (E17/E18, `icalendar_event_v1.rb:37-97,173-206`):
  * 8-char values are dates; datetimes are `...Z` (UTC), TZID-parameterized
  * (zone database lookup with fallback UTC + missing-tz flag), or naive
  * (assumed UTC, flagged). ISO 8601 durations for implicit DTEND.
  */
object IcsTime {

  private val DateFmt = DateTimeFormatter.BASIC_ISO_DATE          // yyyyMMdd
  private val DtFmt = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss")

  def isDateValue(v: String): Boolean = v.length == 8

  def parseDate(v: String): LocalDate = LocalDate.parse(v, DateFmt)

  /** Common non-IANA zone spellings seen in real feeds (the reference keeps a
    * fuzzy tz database wrapper, `lib/webhookdb/timezone.rb:136`). */
  private val ZoneAliases: Map[String, String] = Map(
    "Pacific Standard Time" -> "America/Los_Angeles",
    "Mountain Standard Time" -> "America/Denver",
    "Central Standard Time" -> "America/Chicago",
    "Eastern Standard Time" -> "America/New_York",
    "GMT Standard Time" -> "Europe/London",
    "W. Europe Standard Time" -> "Europe/Berlin",
    "UTC" -> "UTC", "GMT" -> "GMT", "Z" -> "UTC")

  def zoneFor(tzid: String): Option[ZoneId] =
    try Some(ZoneId.of(ZoneAliases.getOrElse(tzid, tzid)))
    catch { case _: DateTimeException => None }

  /** Parse a datetime entry -> (instant, tz-resolved?). Naive and
    * unknown-TZID values anchor to UTC with the flag false. */
  def parseDateTime(entry: Ics.Entry): (Instant, Boolean) = {
    val v = entry.v
    require(!isDateValue(v), "date value passed to parseDateTime")
    if (v.endsWith("Z")) {
      val ldt = LocalDateTime.parse(v.dropRight(1), DtFmt)
      (ldt.toInstant(ZoneOffset.UTC), true)
    } else entry.param("TZID") match {
      case Some(tzid) =>
        val ldt = LocalDateTime.parse(v, DtFmt)
        zoneFor(tzid) match {
          case Some(zone) => (ldt.atZone(zone).toInstant, true)
          case None => (ldt.toInstant(ZoneOffset.UTC), false)
        }
      case None =>
        (LocalDateTime.parse(v, DtFmt).toInstant(ZoneOffset.UTC), false)
    }
  }

  /** Date or datetime with the tz-resolution flag (dates are always true). */
  def parseDateOrDateTime(entry: Ics.Entry): (Either[LocalDate, Instant], Boolean) =
    if (isDateValue(entry.v)) (Left(parseDate(entry.v)), true)
    else { val (i, ok) = parseDateTime(entry); (Right(i), ok) }

  private val DurRe =
    """([+-]?)P(?:(\d+)W)?(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?)?""".r

  /** ISO 8601 duration (RFC 5545 §3.3.6 subset: weeks/days/time). */
  def parseDuration(s: String): Duration = s match {
    case DurRe(sign, w, d, h, m, sec) =>
      def n(x: String) = if (x == null) 0L else x.toLong
      val total = Duration.ofDays(n(w) * 7 + n(d))
        .plusHours(n(h)).plusMinutes(n(m)).plusSeconds(n(sec))
      if (sign == "-") total.negated() else total
    case _ => throw new IllegalArgumentException(s"bad duration: $s")
  }
}

package graft.operators

import java.time._
import java.time.temporal.WeekFields

/** Bounded RFC 5545 recurrence expansion (G1,
  * `icalendar_calendar_v1.rb:466-643`): FREQ (SECONDLY..YEARLY), INTERVAL,
  * COUNT, UNTIL, BYDAY (with ordinals; ordinal 0 = every matching weekday),
  * BYMONTHDAY, BYMONTH, BYWEEKNO, BYSETPOS over dates and zone-aware
  * datetimes, with RDATE/EXDATE merge, ambiguous-rule sanitization, and a
  * hard enumeration cap (the reference's DoS cutoff).
  *
  * Recurrence arithmetic happens in the event's original zone (LocalDateTime
  * + zone), so a weekly 10:00 meeting stays 10:00 across DST — then converts
  * to Instant.
  *
  * Model: each frequency period (day/week/month/year) yields a sorted
  * candidate set; BYSETPOS selects within the period's set; the flattened
  * stream is then bounded by start/UNTIL/cutoff/COUNT. This mirrors the RFC's
  * expand-then-limit semantics and is what makes MONTHLY `BYDAY=TU` produce
  * every Tuesday (not just the first).
  */
object Rrule {

  final case class Rule(
      freq: String,
      interval: Int = 1,
      count: Option[Int] = None,
      until: Option[String] = None, // raw UNTIL value (date or datetime w/ optional Z)
      byDay: Seq[(Int, DayOfWeek)] = Nil, // ordinal 0 = every
      byMonthDay: Seq[Int] = Nil,
      byMonth: Seq[Int] = Nil,
      bySetPos: Seq[Int] = Nil,
      byWeekNo: Seq[Int] = Nil,
      wkst: DayOfWeek = DayOfWeek.MONDAY)

  private val DayMap = Map(
    "MO" -> DayOfWeek.MONDAY, "TU" -> DayOfWeek.TUESDAY, "WE" -> DayOfWeek.WEDNESDAY,
    "TH" -> DayOfWeek.THURSDAY, "FR" -> DayOfWeek.FRIDAY, "SA" -> DayOfWeek.SATURDAY,
    "SU" -> DayOfWeek.SUNDAY)

  /** Parse an RRULE value, applying the reference's ambiguity sanitization
    * (`_icecube_rule_from_ical`, `icalendar_calendar_v1.rb:620-643`):
    * WEEKLY+BYMONTHDAY drops BYMONTHDAY; MONTHLY+BYYEARDAY+BYMONTHDAY drops
    * BYYEARDAY. */
  def parse(ical: String): Rule = {
    var s = ical
    if (s.contains("FREQ=WEEKLY") && s.contains("BYMONTHDAY="))
      s = s.replaceAll("BYMONTHDAY=[\\d,-]+", "")
    if (s.contains("FREQ=MONTHLY") && s.contains("BYYEARDAY=") && s.contains("BYMONTHDAY="))
      s = s.replaceAll("BYYEARDAY=[\\d,-]+", "")
    s = s.replaceAll(";;+", ";").stripPrefix(";").stripSuffix(";")

    val parts = s.split(";").filter(_.nonEmpty).flatMap { kv =>
      kv.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
    }.toMap
    val byDay = parts.get("BYDAY").toSeq.flatMap(_.split(",")).flatMap { d =>
      val m = """([+-]?\d*)([A-Z]{2})""".r
      d match {
        case m(ord, day) if DayMap.contains(day) =>
          Some((if (ord.isEmpty || ord == "+" || ord == "-") 0 else ord.toInt) -> DayMap(day))
        case _ => None
      }
    }
    def ints(key: String): Seq[Int] =
      parts.get(key).toSeq.flatMap(_.split(",")).flatMap(_.toIntOption)
    Rule(
      freq = parts.getOrElse("FREQ", "DAILY"),
      // tolerant numerics: a hostile/buggy feed's 'INTERVAL=abc' must
      // degrade (default), not throw out of the ingest task — consistent
      // with the toIntOption handling of the BY* fields above
      interval = parts.get("INTERVAL").flatMap(_.toIntOption).getOrElse(1).max(1),
      count = parts.get("COUNT").flatMap(_.toIntOption),
      until = parts.get("UNTIL"),
      byDay = byDay.toSeq,
      byMonthDay = ints("BYMONTHDAY"),
      byMonth = ints("BYMONTH"),
      bySetPos = ints("BYSETPOS"),
      byWeekNo = ints("BYWEEKNO"),
      wkst = parts.get("WKST").flatMap(DayMap.get).getOrElse(DayOfWeek.MONDAY))
  }

  /** Hard cap on enumerated candidates — the DoS bound for impossible rules
    * (`icalendar_calendar_v1.rb:575`). */
  val MaxCandidates = 100000

  private def sortKey(d: LocalDateTime): (Long, Int) =
    (d.toLocalDate.toEpochDay, d.toLocalTime.toSecondOfDay)

  /** BYDAY selection over a period's chronological day list: ordinal 0 keeps
    * every matching weekday; +n / -n pick the nth from the front / back. */
  private def selectByDay(dates: Seq[LocalDateTime],
                          byDay: Seq[(Int, DayOfWeek)]): Seq[LocalDateTime] =
    byDay.flatMap { case (ord, dow) =>
      val ds = dates.filter(_.getDayOfWeek == dow)
      ord match {
        case 0 => ds
        case n if n > 0 => ds.lift(n - 1).toSeq
        case n => ds.lift(ds.size + n).toSeq
      }
    }.distinct.sortBy(sortKey)

  /** Resolve BYMONTHDAY values (negative = from month end) within a month. */
  private def monthDays(monthStart: LocalDateTime, doms: Seq[Int]): Seq[LocalDateTime] = {
    val len = monthStart.toLocalDate.lengthOfMonth()
    doms.flatMap { dom =>
      val day = if (dom < 0) len + 1 + dom else dom
      if (day >= 1 && day <= len) Some(monthStart.withDayOfMonth(day)) else None
    }.distinct.sortBy(sortKey)
  }

  /** Candidates within one month period, honoring BYMONTHDAY/BYDAY per the
    * RFC's expand/limit table (BYDAY limits a BYMONTHDAY expansion). */
  private def monthCandidates(m: LocalDateTime, rule: Rule, dtstartDom: Int): Seq[LocalDateTime] = {
    val len = m.toLocalDate.lengthOfMonth()
    if (rule.byMonthDay.nonEmpty) {
      val sel = monthDays(m, rule.byMonthDay)
      if (rule.byDay.nonEmpty) {
        val dows = rule.byDay.map(_._2).toSet
        sel.filter(d => dows.contains(d.getDayOfWeek))
      } else sel
    } else if (rule.byDay.nonEmpty) {
      selectByDay((1 to len).map(m.withDayOfMonth(_)), rule.byDay)
    } else if (dtstartDom <= len) Seq(m.withDayOfMonth(dtstartDom))
    else Nil
  }

  /** Per-period candidate sets (sorted within each period; periods ascend). */
  private def periodCandidates(start: LocalDateTime, rule: Rule): Iterator[Seq[LocalDateTime]] = {
    val byDayDows = rule.byDay.map(_._2).toSet
    def dowOk(d: LocalDateTime) = byDayDows.isEmpty || byDayDows.contains(d.getDayOfWeek)
    def domOk(d: LocalDateTime) = rule.byMonthDay.isEmpty || {
      val len = d.toLocalDate.lengthOfMonth()
      rule.byMonthDay.exists(x => (if (x < 0) len + 1 + x else x) == d.getDayOfMonth)
    }
    rule.freq match {
      case "SECONDLY" =>
        Iterator.iterate(start)(_.plusSeconds(rule.interval))
          .map(d => if (dowOk(d) && domOk(d)) Seq(d) else Nil)
      case "MINUTELY" =>
        Iterator.iterate(start)(_.plusMinutes(rule.interval))
          .map(d => if (dowOk(d) && domOk(d)) Seq(d) else Nil)
      case "HOURLY" =>
        Iterator.iterate(start)(_.plusHours(rule.interval))
          .map(d => if (dowOk(d) && domOk(d)) Seq(d) else Nil)
      case "DAILY" =>
        // BYDAY/BYMONTHDAY limit (filter) for DAILY
        Iterator.iterate(start)(_.plusDays(rule.interval))
          .map(d => if (dowOk(d) && domOk(d)) Seq(d) else Nil)
      case "WEEKLY" =>
        if (rule.byDay.isEmpty)
          Iterator.iterate(start)(_.plusWeeks(rule.interval)).map(Seq(_))
        else {
          val startOfWeek = {
            val diff = (start.getDayOfWeek.getValue - rule.wkst.getValue + 7) % 7
            start.minusDays(diff)
          }
          Iterator.iterate(startOfWeek)(_.plusWeeks(rule.interval)).map { week =>
            (0 until 7).map(week.plusDays(_))
              .filter(d => byDayDows.contains(d.getDayOfWeek))
              .sortBy(sortKey)
          }
        }
      case "MONTHLY" =>
        val dtstartDom = start.getDayOfMonth
        Iterator.iterate(start.withDayOfMonth(1))(_.plusMonths(rule.interval))
          .map(m => monthCandidates(m, rule, dtstartDom))
      case "YEARLY" =>
        val dtstartDom = start.getDayOfMonth
        Iterator.iterate(start.withDayOfYear(1))(_.plusYears(rule.interval)).map { y =>
          if (rule.byWeekNo.nonEmpty) {
            // week-of-year expansion: days of the week-based year in the
            // requested weeks, limited to BYDAY dows (default: DTSTART's dow)
            val wf = WeekFields.of(rule.wkst, 4)
            val wantDows = if (byDayDows.nonEmpty) byDayDows else Set(start.getDayOfWeek)
            val span = Iterator.iterate(y.minusDays(7))(_.plusDays(1))
              .takeWhile(_.isBefore(y.plusYears(1).plusDays(7))).toSeq
            val inYear = span.filter(_.get(wf.weekBasedYear) == y.getYear)
            val maxWeek = inYear.map(_.get(wf.weekOfWeekBasedYear)).maxOption.getOrElse(52)
            val wantWeeks = rule.byWeekNo.map(w => if (w < 0) maxWeek + 1 + w else w).toSet
            inYear.filter(d => wantWeeks.contains(d.get(wf.weekOfWeekBasedYear)))
              .filter(d => wantDows.contains(d.getDayOfWeek))
              .sortBy(sortKey)
          } else if (rule.byMonth.isEmpty && rule.byMonthDay.isEmpty && rule.byDay.nonEmpty) {
            // BYDAY over the whole year (e.g. FREQ=YEARLY;BYDAY=20MO)
            val days = (1 to y.toLocalDate.lengthOfYear).map(y.withDayOfYear(_))
            selectByDay(days, rule.byDay)
          } else {
            val months =
              if (rule.byMonth.nonEmpty) rule.byMonth.sorted
              else Seq(start.getMonthValue)
            months.flatMap(mo => monthCandidates(y.withMonth(mo).withDayOfMonth(1), rule, dtstartDom))
          }
        }
      case _ => Iterator.single(Seq(start)) // unknown FREQ: degrade to one occurrence
    }
  }

  /** Expand occurrence start datetimes (in the event's zone) from `start`,
    * stopping at `cutoff` (exclusive) or UNTIL. Dates are modeled as midnight
    * local. EXDATE/RDATE/COUNT handling composes on top (see
    * [[occurrences]]). */
  private def baseOccurrences(start: LocalDateTime, rule: Rule,
                              untilLocal: Option[LocalDateTime],
                              cutoff: LocalDateTime): Iterator[LocalDateTime] = {
    val periods = periodCandidates(start, rule).take(MaxCandidates)
    val monthFiltered =
      if (rule.byMonth.nonEmpty && rule.freq != "YEARLY")
        periods.map(_.filter(d => rule.byMonth.contains(d.getMonthValue)))
      else periods
    val posApplied =
      if (rule.bySetPos.nonEmpty)
        monthFiltered.map { s =>
          rule.bySetPos.flatMap(p => if (p > 0) s.lift(p - 1) else s.lift(s.size + p))
            .distinct.sortBy(sortKey)
        }
      else monthFiltered
    val flat = posApplied.flatten.filter(d => !d.isBefore(start))
    val bounded = flat.take(MaxCandidates).takeWhile(_.isBefore(cutoff))
    untilLocal match {
      case Some(u) => bounded.takeWhile(!_.isAfter(u)) // UNTIL inclusive
      case None => bounded
    }
  }

  /** Full expansion: RRULE occurrences merged with RDATEs, minus EXDATEs,
    * bounded by COUNT/UNTIL/cutoff. Returns occurrence starts as
    * LocalDateTime in the event's zone. */
  def occurrences(start: LocalDateTime, rule: Rule, zone: ZoneId,
                  rdates: Seq[LocalDateTime] = Nil,
                  exdates: Seq[LocalDateTime] = Nil,
                  cutoff: LocalDateTime): Seq[LocalDateTime] = {
    // a garbled UNTIL from a hostile feed degrades to "no UNTIL bound"
    // (the projection cutoff still bounds enumeration) instead of throwing
    // out of the ingest task
    val untilLocal = rule.until.flatMap { u =>
      try Some {
        if (u.length == 8) java.time.LocalDate
          .parse(u, format.DateTimeFormatter.BASIC_ISO_DATE).atTime(23, 59, 59)
        else if (u.endsWith("Z"))
          LocalDateTime.parse(u.dropRight(1),
            format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss"))
            .atZone(ZoneOffset.UTC).withZoneSameInstant(zone).toLocalDateTime
        else LocalDateTime.parse(u, format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss"))
      } catch { case _: java.time.format.DateTimeParseException => None }
    }
    val base = baseOccurrences(start, rule, untilLocal, cutoff)
    val counted = rule.count.fold(base.toSeq)(c => base.take(c).toSeq)
    val exSet = exdates.toSet
    (counted ++ rdates.filter(_.isBefore(cutoff)))
      .distinct.sortBy(sortKey)
      .filterNot(exSet.contains)
  }
}

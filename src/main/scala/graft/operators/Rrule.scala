package graft.operators

import java.time._

/** Bounded RFC 5545 recurrence expansion (G1,
  * `icalendar_calendar_v1.rb:466-643`): FREQ/INTERVAL/COUNT/UNTIL/BYDAY/
  * BYMONTHDAY/BYMONTH over dates and zone-aware datetimes, with RDATE/EXDATE
  * merge, ambiguous-rule sanitization, and a hard enumeration cap (the
  * reference's DoS cutoff).
  *
  * Recurrence arithmetic happens in the event's original zone (LocalDateTime
  * + zone), so a weekly 10:00 meeting stays 10:00 across DST — then converts
  * to Instant.
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
      s = s.replaceAll("BYMONTHDAY=[\\d,]+", "")
    if (s.contains("FREQ=MONTHLY") && s.contains("BYYEARDAY=") && s.contains("BYMONTHDAY="))
      s = s.replaceAll("BYYEARDAY=[\\d,]+", "")
    s = s.replaceAll(";;+", ";").stripPrefix(";").stripSuffix(";")

    val parts = s.split(";").filter(_.nonEmpty).flatMap { kv =>
      kv.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
    }.toMap
    val byDay = parts.get("BYDAY").toSeq.flatMap(_.split(",")).flatMap { d =>
      val m = """([+-]?\d*)([A-Z]{2})""".r
      d match {
        case m(ord, day) if DayMap.contains(day) =>
          Some((if (ord.isEmpty) 0 else ord.toInt) -> DayMap(day))
        case _ => None
      }
    }
    Rule(
      freq = parts.getOrElse("FREQ", "DAILY"),
      interval = parts.get("INTERVAL").map(_.toInt).getOrElse(1).max(1),
      count = parts.get("COUNT").map(_.toInt),
      until = parts.get("UNTIL"),
      byDay = byDay.toSeq,
      byMonthDay = parts.get("BYMONTHDAY").toSeq.flatMap(_.split(",")).map(_.toInt),
      byMonth = parts.get("BYMONTH").toSeq.flatMap(_.split(",")).map(_.toInt),
      wkst = parts.get("WKST").flatMap(DayMap.get).getOrElse(DayOfWeek.MONDAY))
  }

  /** Hard cap on enumerated candidates — the DoS bound for impossible rules
    * (`icalendar_calendar_v1.rb:575`). */
  val MaxCandidates = 100000

  /** Expand occurrence start datetimes (in the event's zone) from `start`,
    * stopping at `cutoff` (exclusive) or COUNT/UNTIL. Dates are modeled as
    * midnight local. EXDATE/RDATE handling composes on top (see
    * [[occurrences]]). */
  private def baseOccurrences(start: LocalDateTime, rule: Rule,
                              untilLocal: Option[LocalDateTime],
                              cutoff: LocalDateTime): Iterator[LocalDateTime] = {
    val raw: Iterator[LocalDateTime] = rule.freq match {
      case "DAILY" =>
        Iterator.iterate(start)(_.plusDays(rule.interval))
      case "WEEKLY" =>
        if (rule.byDay.isEmpty)
          Iterator.iterate(start)(_.plusWeeks(rule.interval))
        else {
          val days = rule.byDay.map(_._2).distinct
          // anchor week = week of start (starting wkst); step interval weeks
          val startOfWeek = {
            val diff = (start.getDayOfWeek.getValue - rule.wkst.getValue + 7) % 7
            start.minusDays(diff)
          }
          Iterator.iterate(startOfWeek)(_.plusWeeks(rule.interval)).flatMap { week =>
            (0 until 7).map(week.plusDays(_))
              .filter(d => days.contains(d.getDayOfWeek))
              .filter(d => !d.isBefore(start))
              .sortBy(_.toLocalDate.toEpochDay)
          }
        }
      case "MONTHLY" =>
        if (rule.byMonthDay.nonEmpty) {
          val doms = rule.byMonthDay.sorted
          Iterator.iterate(start.withDayOfMonth(1))(_.plusMonths(rule.interval)).flatMap { m =>
            doms.flatMap { dom =>
              val day = if (dom < 0) m.toLocalDate.lengthOfMonth() + 1 + dom else dom
              if (day >= 1 && day <= m.toLocalDate.lengthOfMonth())
                Some(m.withDayOfMonth(day)) else None
            }.filter(d => !d.isBefore(start))
          }
        } else if (rule.byDay.nonEmpty) {
          Iterator.iterate(start.withDayOfMonth(1))(_.plusMonths(rule.interval)).flatMap { m =>
            rule.byDay.flatMap { case (ord, dow) =>
              nthWeekdayOfMonth(m, ord, dow)
            }.sortBy(_.toLocalDate.toEpochDay).filter(d => !d.isBefore(start))
          }
        } else {
          val dom = start.getDayOfMonth
          Iterator.iterate(start.withDayOfMonth(1))(_.plusMonths(rule.interval))
            .flatMap { m =>
              if (dom <= m.toLocalDate.lengthOfMonth()) Some(m.withDayOfMonth(dom)) else None
            }.filter(d => !d.isBefore(start))
        }
      case "YEARLY" =>
        val months = if (rule.byMonth.nonEmpty) rule.byMonth else Seq(start.getMonthValue)
        val dom = start.getDayOfMonth
        Iterator.iterate(start.withDayOfYear(1))(_.plusYears(rule.interval)).flatMap { y =>
          months.sorted.flatMap { m =>
            val firstOfMonth = y.withMonth(m).withDayOfMonth(1)
            if (dom <= firstOfMonth.toLocalDate.lengthOfMonth())
              Some(firstOfMonth.withDayOfMonth(dom)) else None
          }.filter(d => !d.isBefore(start))
        }
      case _ => Iterator.single(start) // unknown FREQ: degrade to one occurrence
    }
    val monthFiltered =
      if (rule.byMonth.nonEmpty && rule.freq != "YEARLY")
        raw.filter(d => rule.byMonth.contains(d.getMonthValue))
      else raw
    val bounded = monthFiltered.take(MaxCandidates).takeWhile(_.isBefore(cutoff))
    val untilBounded = untilLocal match {
      case Some(u) => bounded.takeWhile(!_.isAfter(u)) // UNTIL inclusive
      case None => bounded
    }
    untilBounded
  }

  private def nthWeekdayOfMonth(monthStart: LocalDateTime, ord: Int,
                                dow: DayOfWeek): Option[LocalDateTime] = {
    val len = monthStart.toLocalDate.lengthOfMonth()
    val days = (1 to len).map(monthStart.withDayOfMonth(_))
      .filter(_.getDayOfWeek == dow)
    ord match {
      case 0 => days.headOption // unspecified ordinal: treat as first
      case n if n > 0 => days.lift(n - 1)
      case n => days.lift(days.size + n)
    }
  }

  /** Full expansion: RRULE occurrences merged with RDATEs, minus EXDATEs,
    * bounded by COUNT/UNTIL/cutoff. Returns occurrence starts as
    * LocalDateTime in the event's zone. */
  def occurrences(start: LocalDateTime, rule: Rule, zone: ZoneId,
                  rdates: Seq[LocalDateTime] = Nil,
                  exdates: Seq[LocalDateTime] = Nil,
                  cutoff: LocalDateTime): Seq[LocalDateTime] = {
    val untilLocal = rule.until.map { u =>
      if (u.length == 8) java.time.LocalDate
        .parse(u, format.DateTimeFormatter.BASIC_ISO_DATE).atTime(23, 59, 59)
      else if (u.endsWith("Z"))
        LocalDateTime.parse(u.dropRight(1),
          format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss"))
          .atZone(ZoneOffset.UTC).withZoneSameInstant(zone).toLocalDateTime
      else LocalDateTime.parse(u, format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss"))
    }
    val base = baseOccurrences(start, rule, untilLocal, cutoff)
    val counted = rule.count.fold(base.toSeq)(c => base.take(c).toSeq)
    val exSet = exdates.toSet
    (counted ++ rdates.filter(_.isBefore(cutoff)))
      .distinct.sortBy(d => (d.toLocalDate.toEpochDay, d.toLocalTime.toSecondOfDay))
      .filterNot(exSet.contains)
  }
}

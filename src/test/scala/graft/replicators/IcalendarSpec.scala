package graft.replicators

import graft.SparkSpec
import graft.operators.Rrule
import graft.sources.Ics
import java.time.{DayOfWeek, Instant, LocalDateTime, ZoneOffset}

/** ICS parsing (S6), RRULE expansion (G1), tz semantics (E17), implicit end
  * (E18), exception identity stealing and reconciliation (R1/R2) — the
  * contract surface of the reference's icalendar specs. */
class IcalendarSpec extends SparkSpec {

  private val now = Instant.parse("2024-06-01T00:00:00Z")

  // ---- parser ----

  test("unfolds continuation lines and parses params + escapes") {
    val feed =
      """BEGIN:VCALENDAR
        |BEGIN:VEVENT
        |UID:ev1
        |SUMMARY:Line one
        |  continued here
        |DTSTART;TZID=America/New_York:20240101T100000
        |DESCRIPTION:a\nb\,c
        |CATEGORIES:work,meeting
        |CATEGORIES:extra
        |BEGIN:VALARM
        |TRIGGER:-PT15M
        |END:VALARM
        |STATUS:CONFIRMED
        |END:VEVENT
        |END:VCALENDAR""".stripMargin
    val events = Ics.parseFeed(feed)
    assert(events.size == 1)
    val h = events.head
    assert(h("SUMMARY").head.v == "Line onecontinued here")
    assert(h("DTSTART").head.params("TZID") == "America/New_York")
    assert(h("DESCRIPTION").head.v == "a\nb,c")
    assert(h("CATEGORIES").map(_.v) == Seq("work,meeting", "extra")) // array key
    assert(!h.contains("TRIGGER")) // nested component content skipped
    assert(h("STATUS").head.v == "CONFIRMED")
  }

  test("hostile param line parses or fails in linear time (no backtracking DoS)") {
    // 10 kB of `;a=,,,…` with no terminating colon: the old nested-greedy
    // LineRe took exponential time here; possessive quantifiers must reject
    // it in well under 100 ms.
    val hostile = "X-EVIL" + (";a=" + ",," * 20) * 400 // ~10 kB, no ':'
    val t0 = System.nanoTime()
    val parsed = Ics.parseLine(hostile)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(parsed.isEmpty)
    assert(ms < 100.0, s"hostile line took $ms ms")
    // a valid line with the same shape still parses
    val ok = Ics.parseLine("DTSTART;TZID=America/New_York;X-A=1,2,3:20240101T100000")
    assert(ok.exists { case (n, e) =>
      n == "DTSTART" && e.v == "20240101T100000" &&
        e.params("TZID") == "America/New_York" && e.params("X-A") == "1"
    })
  }

  // ---- rrule ----

  private def expand(start: String, rule: String,
                     ex: Seq[String] = Nil, rd: Seq[String] = Nil) = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss")
    Rrule.occurrences(
      LocalDateTime.parse(start, fmt), Rrule.parse(rule), ZoneOffset.UTC,
      rdates = rd.map(LocalDateTime.parse(_, fmt)),
      exdates = ex.map(LocalDateTime.parse(_, fmt)),
      cutoff = LocalDateTime.parse("20300101T000000", fmt))
  }

  test("weekly count with exdate") {
    val got = expand("20240101T100000", "FREQ=WEEKLY;COUNT=5",
      ex = Seq("20240115T100000"))
    assert(got.map(_.toString) == Seq(
      "2024-01-01T10:00", "2024-01-08T10:00", "2024-01-22T10:00", "2024-01-29T10:00"))
  }

  test("weekly byday spans the week in order") {
    val got = expand("20240101T090000", "FREQ=WEEKLY;BYDAY=MO,WE;COUNT=4")
    assert(got.map(_.toString) == Seq(
      "2024-01-01T09:00", "2024-01-03T09:00", "2024-01-08T09:00", "2024-01-10T09:00"))
  }

  test("monthly day-31 skips short months; until is inclusive") {
    val got = expand("20240131T120000", "FREQ=MONTHLY;UNTIL=20240601T120000")
    assert(got.map(_.toString) == Seq(
      "2024-01-31T12:00", "2024-03-31T12:00", "2024-05-31T12:00"))
  }

  test("monthly nth weekday and yearly") {
    val got = expand("20240109T080000", "FREQ=MONTHLY;BYDAY=2TU;COUNT=3")
    assert(got.map(_.toString) == Seq(
      "2024-01-09T08:00", "2024-02-13T08:00", "2024-03-12T08:00"))
    val yearly = expand("20240229T100000", "FREQ=YEARLY;COUNT=3")
    // Feb 29 only exists in leap years (skipped otherwise); the 2030 test
    // cutoff bounds enumeration before the third leap year
    assert(yearly.map(_.toString) == Seq(
      "2024-02-29T10:00", "2028-02-29T10:00"))
  }

  test("rdate merges and sorts; ambiguous WEEKLY+BYMONTHDAY sanitized") {
    val got = expand("20240101T100000", "FREQ=WEEKLY;COUNT=2",
      rd = Seq("20240103T100000"))
    assert(got.map(_.toString) == Seq(
      "2024-01-01T10:00", "2024-01-03T10:00", "2024-01-08T10:00"))
    val r = Rrule.parse("FREQ=WEEKLY;BYMONTHDAY=4;COUNT=2")
    assert(r.byMonthDay.isEmpty) // dropped per sanitization
    assert(r.wkst == DayOfWeek.MONDAY)
  }

  test("MONTHLY BYDAY without ordinal expands every matching weekday") {
    // RFC 5545: FREQ=MONTHLY;BYDAY=TU is *every* Tuesday of the month
    val got = expand("20240101T090000", "FREQ=MONTHLY;BYDAY=TU;COUNT=6")
    assert(got.map(_.toString) == Seq(
      "2024-01-02T09:00", "2024-01-09T09:00", "2024-01-16T09:00",
      "2024-01-23T09:00", "2024-01-30T09:00", "2024-02-06T09:00"))
  }

  test("YEARLY honors BYDAY ordinals within BYMONTH") {
    // 2nd Sunday of May (`FREQ=YEARLY;BYMONTH=5;BYDAY=2SU`)
    val got = expand("20240101T090000", "FREQ=YEARLY;BYMONTH=5;BYDAY=2SU;COUNT=3")
    assert(got.map(_.toString) == Seq(
      "2024-05-12T09:00", "2025-05-11T09:00", "2026-05-10T09:00"))
  }

  test("YEARLY honors BYMONTHDAY including negative (month-end)") {
    val got = expand("20240101T080000", "FREQ=YEARLY;BYMONTH=11;BYMONTHDAY=-1;COUNT=2")
    assert(got.map(_.toString) == Seq("2024-11-30T08:00", "2025-11-30T08:00"))
  }

  test("BYSETPOS selects within the period set (last weekday of month)") {
    val got = expand("20240101T170000",
      "FREQ=MONTHLY;BYDAY=MO,TU,WE,TH,FR;BYSETPOS=-1;COUNT=3")
    assert(got.map(_.toString) == Seq(
      "2024-01-31T17:00", "2024-02-29T17:00", "2024-03-29T17:00"))
  }

  test("HOURLY and MINUTELY frequencies expand") {
    val got = expand("20240101T000000", "FREQ=HOURLY;INTERVAL=6;COUNT=4")
    assert(got.map(_.toString) == Seq(
      "2024-01-01T00:00", "2024-01-01T06:00", "2024-01-01T12:00", "2024-01-01T18:00"))
    val mins = expand("20240101T000000", "FREQ=MINUTELY;INTERVAL=30;COUNT=3")
    assert(mins.map(_.toString) == Seq(
      "2024-01-01T00:00", "2024-01-01T00:30", "2024-01-01T01:00"))
  }

  test("YEARLY BYWEEKNO with BYDAY lands on the ISO week's weekday") {
    val got = expand("20240101T120000", "FREQ=YEARLY;BYWEEKNO=20;BYDAY=MO;COUNT=2")
    assert(got.map(_.toString) == Seq("2024-05-13T12:00", "2025-05-12T12:00"))
  }

  test("YEARLY BYDAY over the whole year (nth weekday of year)") {
    // 20th Monday of the year
    val got = expand("20240101T100000", "FREQ=YEARLY;BYDAY=20MO;COUNT=2")
    assert(got.map(_.toString) == Seq("2024-05-13T10:00", "2025-05-19T10:00"))
  }

  test("MONTHLY negative BYMONTHDAY tracks month length") {
    val got = expand("20240101T120000", "FREQ=MONTHLY;BYMONTHDAY=-1;COUNT=3")
    assert(got.map(_.toString) == Seq(
      "2024-01-31T12:00", "2024-02-29T12:00", "2024-03-31T12:00"))
  }

  test("DAILY BYMONTH limits to the named months across years") {
    val got = expand("20241230T080000", "FREQ=DAILY;BYMONTH=1;COUNT=3")
    assert(got.map(_.toString) == Seq(
      "2025-01-01T08:00", "2025-01-02T08:00", "2025-01-03T08:00"))
  }

  test("COUNT applies after BYSETPOS selection, before EXDATE removal") {
    // first weekday of each month, count 4, exdate on March's
    val got = expand("20240101T090000",
      "FREQ=MONTHLY;BYDAY=MO,TU,WE,TH,FR;BYSETPOS=1;COUNT=4",
      ex = Seq("20240301T090000"))
    assert(got.map(_.toString) == Seq(
      "2024-01-01T09:00", "2024-02-01T09:00", "2024-04-01T09:00"))
  }

  test("WKST=SU changes which week an interval-2 BYDAY rule lands in") {
    // start Tue 2024-01-02; weeks anchored on Sunday: with WKST=SU the next
    // eligible week starts Sun Jan 14, so WE occurrences are Jan 3, 17, 31
    val su = expand("20240102T090000", "FREQ=WEEKLY;INTERVAL=2;BYDAY=TU,WE;WKST=SU;COUNT=4")
    assert(su.map(_.toString) == Seq(
      "2024-01-02T09:00", "2024-01-03T09:00", "2024-01-16T09:00", "2024-01-17T09:00"))
  }

  test("folded lines longer than 75 octets and multi-param properties parse") {
    val longDesc = "x" * 60
    val feed = s"""BEGIN:VCALENDAR
      |BEGIN:VEVENT
      |UID:long1
      |DESCRIPTION:$longDesc
      | $longDesc
      | tail
      |ATTENDEE;CN="Doe, J";ROLE=REQ-PARTICIPANT:mailto:j@x.co
      |DTSTART:20240301T000000Z
      |END:VEVENT
      |END:VCALENDAR""".stripMargin
    val h = Ics.parseFeed(feed).head
    assert(h("DESCRIPTION").head.v == longDesc + longDesc + "tail")
    val att = h("ATTENDEE").head
    assert(att.v == "mailto:j@x.co")
    assert(att.params("CN") == "Doe, J") // quoted param with comma
    assert(att.params("ROLE") == "REQ-PARTICIPANT")
  }

  // ---- end-to-end expansion ----

  private val fixtureFeed =
    """BEGIN:VCALENDAR
      |BEGIN:VEVENT
      |UID:ev1
      |DTSTART;TZID=America/New_York:20240101T100000
      |DTEND;TZID=America/New_York:20240101T110000
      |RRULE:FREQ=WEEKLY;COUNT=5
      |EXDATE;TZID=America/New_York:20240115T100000
      |LAST-MODIFIED:20240101T000000Z
      |STATUS:CONFIRMED
      |GEO:45.5;-122.6
      |CATEGORIES:work,meeting
      |END:VEVENT
      |BEGIN:VEVENT
      |UID:solo
      |DTSTART:20240301
      |END:VEVENT
      |BEGIN:VEVENT
      |UID:durev
      |DTSTART:20240401T120000Z
      |DURATION:PT1H30M
      |END:VEVENT
      |END:VCALENDAR""".stripMargin

  test("feed expansion: recurrence projection, tz conversion, implicit ends") {
    val rows = IcalendarEvents.expandFeed("cal-123", fixtureFeed, now)
    val rec = rows.filter(_.recurring_event_id.contains("ev1"))
    assert(rec.size == 4) // 5 minus the EXDATE
    assert(rec.map(_.compound_identity) ==
      Seq("cal-123-ev1-0", "cal-123-ev1-1", "cal-123-ev1-2", "cal-123-ev1-3"))
    // 10:00 America/New_York = 15:00 UTC in January
    assert(rec.head.start_at.get.toInstant == Instant.parse("2024-01-01T15:00:00Z"))
    assert(rec.head.end_at.get.toInstant == Instant.parse("2024-01-01T16:00:00Z"))
    assert(rec.head.categories == Seq("work", "meeting"))
    assert(rec.head.geo_lat.contains(45.5) && rec.head.geo_lng.contains(-122.6))
    assert(!rec.head.missing_timezone)

    val solo = rows.find(_.uid == "solo").get
    assert(solo.start_date.get.toString == "2024-03-01")
    assert(solo.end_date.get.toString == "2024-03-02") // +1 day default
    assert(solo.start_at.isEmpty)

    val durev = rows.find(_.uid == "durev").get
    assert(durev.end_at.get.toInstant == Instant.parse("2024-04-01T13:30:00Z"))
  }

  test("RECURRENCE-ID exception steals occurrence identity, bumps last-modified") {
    val feed = fixtureFeed.replace("END:VCALENDAR",
      """BEGIN:VEVENT
        |UID:ev1
        |RECURRENCE-ID;TZID=America/New_York:20240108T100000
        |DTSTART;TZID=America/New_York:20240108T140000
        |DTEND;TZID=America/New_York:20240108T150000
        |LAST-MODIFIED:20240102T000000Z
        |STATUS:CONFIRMED
        |END:VEVENT
        |END:VCALENDAR""".stripMargin)
    val rows = IcalendarEvents.expandFeed("cal-123", feed, now)
    val stolen = rows.filter(_.compound_identity == "cal-123-ev1-1")
    assert(stolen.size == 2) // original + exception sharing the identity
    val exception = stolen.find(_.start_at.exists(
      _.toInstant == Instant.parse("2024-01-08T19:00:00Z"))).get
    // +1s over the ORIGINAL's last-modified so the exception wins the merge
    val original = stolen.find(_ != exception).get
    assert(exception.last_modified_at.get.toInstant ==
      original.last_modified_at.get.toInstant.plusSeconds(1))
    assert(exception.recurring_event_sequence == original.recurring_event_sequence)
  }

  test("out-of-rrule exception extends the sequence") {
    val feed = fixtureFeed.replace("END:VCALENDAR",
      """BEGIN:VEVENT
        |UID:ev1
        |RECURRENCE-ID;TZID=America/New_York:20241225T100000
        |DTSTART;TZID=America/New_York:20241225T100000
        |END:VEVENT
        |END:VCALENDAR""".stripMargin)
    val rows = IcalendarEvents.expandFeed("cal-123", feed, now)
    val ext = rows.find(_.start_at.exists(
      _.toInstant == Instant.parse("2024-12-25T15:00:00Z"))).get
    assert(ext.recurring_event_sequence.contains(4)) // extends 0..3
    assert(ext.uid == "ev1-4")
  }

  test("distributed expansion + reconciliation (R1 cancel-missing, R2 stale seq)") {
    import spark.implicits._
    val feeds = Seq(("cal-123", fixtureFeed)).toDS()
    val rows = IcalendarEvents.expandDataset(feeds, now)
    assert(rows.count() == 6)

    val current = rows.toDF()
    // next sync: the series shrank to 2 occurrences; solo and durev vanished
    val shrunkFeed =
      """BEGIN:VCALENDAR
        |BEGIN:VEVENT
        |UID:ev1
        |DTSTART;TZID=America/New_York:20240101T100000
        |DTEND;TZID=America/New_York:20240101T110000
        |RRULE:FREQ=WEEKLY;COUNT=2
        |LAST-MODIFIED:20240101T000000Z
        |STATUS:CONFIRMED
        |END:VEVENT
        |END:VCALENDAR""".stripMargin
    val shrunk = IcalendarEvents.expandFeed("cal-123", shrunkFeed, now)
    val upsertedDs = shrunk.toDS().toDF()
    val after = IcalendarEvents.reconcile(current, upsertedDs, "cal-123")
    val byId = after.collect().map(r =>
      r.getAs[String]("compound_identity") -> r.getAs[String]("status")).toMap
    assert(byId("cal-123-ev1-0") == "CONFIRMED")  // still present
    assert(byId("cal-123-solo") == "CANCELLED")   // missing from feed
    assert(byId("cal-123-durev") == "CANCELLED")
    assert(!byId.contains("cal-123-ev1-3"))       // stale sequence deleted
    assert(!byId.contains("cal-123-ev1-2"))
  }

  test("stale CANCELLED events delete at 20 days within the 3-day lookback window") {
    import spark.implicits._
    val now = java.sql.Timestamp.valueOf("2024-06-30 00:00:00")
    def daysAgo(d: Int) =
      new java.sql.Timestamp(now.getTime - d * 86400000L)
    val events = Seq(
      ("e-fresh-cancelled", "CANCELLED", daysAgo(5)),    // not stale yet
      ("e-stale-cancelled", "CANCELLED", daysAgo(21)),   // in [20, 23) -> delete
      ("e-stale-confirmed", "CONFIRMED", daysAgo(21)),   // wrong status -> keep
      ("e-too-old", "CANCELLED", daysAgo(40)))           // behind lookback -> keep
      .toDF("compound_identity", "status", "last_modified_at")
    val kept = IcalendarEvents
      .deleteStaleCancelled(events, "last_modified_at", now)
      .select("compound_identity").as[String].collect().toSet
    assert(kept === Set("e-fresh-cancelled", "e-stale-confirmed", "e-too-old"))
  }
}

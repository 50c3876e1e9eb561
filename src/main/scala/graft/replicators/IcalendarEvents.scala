package graft.replicators

import graft.functions.IcsTime
import graft.operators.{Reconcile, Rrule}
import graft.sources.Ics
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.{Date => SqlDate, Timestamp}
import java.time._

/** `icalendar_event_v1` (`lib/webhookdb/replicator/icalendar_event_v1.rb`) —
  * the reference's deepest vertical: ICS feed -> expanded event rows.
  *
  * Covered semantics:
  *  - G1 RRULE projection with per-occurrence sequence numbers and
  *    `uid-idx` compound identity (`icalendar_calendar_v1.rb:466-604`);
  *  - RECURRENCE-ID exception events steal the matching occurrence's
  *    identity and bump last-modified +1s so they win the data-diff merge;
  *    out-of-rule exceptions extend the sequence;
  *  - E17 TZID datetime parse with missing-timezone flag;
  *  - E18 implicit DTEND: DURATION, else +1 day (dates) / = start (times);
  *  - E16 compound key `"{calendar}-{uid}"`;
  *  - R1/R2 reconciliation: cancel-missing + stale-sequence delete.
  *
  * Spark shape: one feed expands inside one task (`Dataset.flatMap`) — feeds
  * are independent, so distribution is per-calendar; the 5-year projection
  * bound caps per-feed work.
  */
object IcalendarEvents {

  val RecurrenceProjectionYears = 5 // icalendar_calendar_v1.rb:17
  val DosCutoffDays = 210           // icalendar_calendar_v1.rb:575

  /** Stale-cancelled cleanup bounds (`icalendar.rb:35-37`,
    * `icalendar_event_v1.rb:354-358`): CANCELLED rows go stale at 20 days;
    * each pass scans a 3-day lookback window behind the stale line. */
  val StaleAtDays = 20
  val StaleLookbackDays = 3

  /** R3 preset for the icalendar vertical: drop CANCELLED events whose
    * `updatedAtCol` fell in the [stale+lookback, stale) window before `now`.
    * The windowed predicate is the file-pruning analog of the reference's
    * chunked DELETE. */
  def deleteStaleCancelled(events: DataFrame, updatedAtCol: String,
                           now: Timestamp): DataFrame =
    Reconcile.staleRowDelete(events, updatedAtCol,
      col("status") === "CANCELLED",
      lit(new Timestamp(now.getTime - (StaleAtDays + StaleLookbackDays) * 86400000L)),
      lit(new Timestamp(now.getTime - StaleAtDays * 86400000L)))

  final case class EventRow(
      compound_identity: String,
      calendar_external_id: String,
      uid: String,
      status: Option[String],
      start_at: Option[Timestamp],
      end_at: Option[Timestamp],
      start_date: Option[SqlDate],
      end_date: Option[SqlDate],
      missing_timezone: Boolean,
      categories: Seq[String],
      priority: Option[Int],
      classification: Option[String],
      geo_lat: Option[Double],
      geo_lng: Option[Double],
      recurring_event_id: Option[String],
      recurring_event_sequence: Option[Int],
      last_modified_at: Option[Timestamp],
      data: String)

  private def scalar(h: Ics.VEvent, k: String): Option[Ics.Entry] =
    h.get(k).flatMap(_.headOption)

  private def renderData(h: Ics.VEvent): String = {
    // stable JSON of the raw VEVENT hash (scalar -> object, array keys -> list)
    def entryJson(e: Ics.Entry): String = {
      val params = e.params.toSeq.sortBy(_._1)
        .map { case (k, v) => s""","${esc(k)}":"${esc(v)}"""" }.mkString
      s"""{"v":"${esc(e.v)}"$params}"""
    }
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    h.toSeq.sortBy(_._1).map { case (k, es) =>
      val v = if (Ics.ArrayKeys.contains(k)) es.map(entryJson).mkString("[", ",", "]")
      else entryJson(es.head)
      s""""${esc(k)}":$v"""
    }.mkString("{", ",", "}")
  }

  /** Expand one feed's VEVENTs into rows (pure function; runs inside a
    * task). */
  def expandFeed(calendarId: String, icsText: String, now: Instant): Seq[EventRow] = {
    val events = Ics.parseFeed(icsText)
    val (exceptions, normals) = events.partition(_.contains("RECURRENCE-ID"))

    // expanded occurrence index per series uid, for exception matching
    val expandedByUid = scala.collection.mutable.Map.empty[String, Seq[EventRow]]
    val maxSeqByUid = scala.collection.mutable.Map.empty[String, Int]
    val out = Seq.newBuilder[EventRow]

    normals.foreach { h =>
      val uid = scalar(h, "UID").map(_.v).getOrElse("")
      val rows = expandOne(calendarId, h, uid, now)
      if (rows.size > 1 || h.contains("RRULE")) {
        expandedByUid(uid) = rows
        maxSeqByUid(uid) = rows.flatMap(_.recurring_event_sequence).maxOption.getOrElse(-1)
      }
      out ++= rows
    }

    exceptions.foreach { h =>
      val uid = scalar(h, "UID").map(_.v).getOrElse("")
      val recurrenceId = scalar(h, "RECURRENCE-ID").get
      val (target, _) = IcsTime.parseDateOrDateTime(recurrenceId)
      val base = rowFor(calendarId, h, uid, seq = None)
      expandedByUid.get(uid) match {
        case None =>
          out += base // no series: standalone event (recurring_event_id nil)
        case Some(series) =>
          val matched = series.find { r =>
            target match {
              case Left(d) => r.start_date.exists(_.toLocalDate == d)
              case Right(i) => r.start_at.exists(_.toInstant == i)
            }
          }
          matched match {
            case Some(m) =>
              // steal identity; last-modified +1s beats the original in merge
              out += base.copy(
                compound_identity = m.compound_identity,
                uid = m.uid,
                recurring_event_id = Some(uid),
                recurring_event_sequence = m.recurring_event_sequence,
                last_modified_at = m.last_modified_at
                  .map(t => Timestamp.from(t.toInstant.plusSeconds(1)))
                  .orElse(Some(Timestamp.from(now.plusSeconds(1)))))
            case None =>
              // out-of-rrule exception (e.g. UNTIL before RECURRENCE-ID):
              // extend the sequence
              val seq = maxSeqByUid.getOrElse(uid, -1) + 1
              maxSeqByUid(uid) = seq
              out += base.copy(
                compound_identity = s"$calendarId-$uid-$seq",
                uid = s"$uid-$seq",
                recurring_event_id = Some(uid),
                recurring_event_sequence = Some(seq))
          }
      }
    }
    out.result()
  }

  /** Expand one VEVENT: single row, or the projected recurrence series. */
  private def expandOne(calendarId: String, h: Ics.VEvent, uid: String,
                        now: Instant): Seq[EventRow] = {
    val startEntry = scalar(h, "DTSTART")
    val ruleEntry = scalar(h, "RRULE")
    if (ruleEntry.isEmpty || startEntry.isEmpty)
      return Seq(rowFor(calendarId, h, uid, seq = None))

    val (startParsed, _) = IcsTime.parseDateOrDateTime(startEntry.get)
    val isDate = startParsed.isLeft
    val zone = startEntry.get.param("TZID").flatMap(IcsTime.zoneFor).getOrElse(ZoneOffset.UTC)
    val startLocal = startParsed match {
      case Left(d) => d.atStartOfDay()
      case Right(i) => i.atZone(zone).toLocalDateTime
    }
    if (startLocal.getYear < 1000)
      return Seq(rowFor(calendarId, h, uid, seq = None)) // misconfigured: non-recurring

    val rule = Rrule.parse(ruleEntry.get.v)
    val projectAfter = now.atZone(zone).toLocalDateTime.plusYears(RecurrenceProjectionYears)
    val cutoff = projectAfter.plusDays(DosCutoffDays)
    def entryTimes(key: String): Seq[LocalDateTime] =
      h.getOrElse(key, Nil).flatMap { e =>
        e.v.split(",").map { v =>
          IcsTime.parseDateOrDateTime(e.copy(v = v)) match {
            case (Left(d), _) => d.atStartOfDay()
            case (Right(i), _) => i.atZone(zone).toLocalDateTime
          }
        }
      }
    val occs0 = Rrule.occurrences(startLocal, rule, zone,
      rdates = entryTimes("RDATE"), exdates = entryTimes("EXDATE"), cutoff = cutoff)
    // the reference yields one occurrence past the projection bound, then stops
    val pastBoundIdx = occs0.indexWhere(_.isAfter(projectAfter))
    val occs = if (pastBoundIdx >= 0) occs0.take(pastBoundIdx + 1) else occs0

    val durationOfEvent: Option[Duration] = {
      val endEntry = scalar(h, "DTEND")
      endEntry.map { ee =>
        val (e, _) = IcsTime.parseDateOrDateTime(ee)
        (startParsed, e) match {
          case (Left(s), Left(en)) => Duration.ofDays(en.toEpochDay - s.toEpochDay)
          case (Right(s), Right(en)) => Duration.between(s, en)
          case _ => Duration.ZERO
        }
      }
    }

    occs.zipWithIndex.map { case (occ, idx) =>
      val row = rowFor(calendarId, h, uid, seq = Some(idx),
        overrideStart = Some((occ, isDate, zone)), seriesDuration = durationOfEvent)
      row.copy(
        compound_identity = s"$calendarId-$uid-$idx",
        uid = s"$uid-$idx",
        recurring_event_id = Some(uid))
    }
  }

  /** Build one row from a VEVENT (optionally overriding the start for a
    * projected occurrence). */
  private def rowFor(calendarId: String, h: Ics.VEvent, uid: String,
                     seq: Option[Int],
                     overrideStart: Option[(LocalDateTime, Boolean, ZoneId)] = None,
                     seriesDuration: Option[Duration] = None): EventRow = {
    var missingTz = false
    def dt(key: String): (Option[Instant], Option[LocalDate]) =
      scalar(h, key) match {
        case None => (None, None)
        case Some(e) =>
          IcsTime.parseDateOrDateTime(e) match {
            case (Left(d), _) => (None, Some(d))
            case (Right(i), ok) =>
              if (!ok) missingTz = true
              (Some(i), None)
          }
      }

    var (startAt, startDate) = dt("DTSTART")
    var (endAt, endDate) = dt("DTEND")

    overrideStart.foreach { case (occ, isDate, zone) =>
      if (isDate) { startDate = Some(occ.toLocalDate); startAt = None }
      else { startAt = Some(occ.atZone(zone).toInstant); startDate = None }
      // recompute end from the series duration at this occurrence
      (seriesDuration, startAt, startDate) match {
        case (Some(dur), Some(s), _) => endAt = Some(s.plus(dur)); endDate = None
        case (Some(dur), _, Some(sd)) =>
          endDate = Some(sd.plusDays(dur.toDays)); endAt = None
        case _ => endAt = None; endDate = None
      }
    }

    // E18 implicit end
    val duration = scalar(h, "DURATION").map(e => IcsTime.parseDuration(e.v))
    if (startAt.isDefined && endAt.isEmpty) {
      endAt = Some(duration.fold(startAt.get)(d => startAt.get.plus(d)))
      endDate = None
    } else if (startDate.isDefined && endDate.isEmpty) {
      endDate = Some(duration.fold(startDate.get.plusDays(1))(d =>
        startDate.get.plusDays(d.toDays.max(1))))
    }

    val categories = h.getOrElse("CATEGORIES", Nil)
      .flatMap(_.v.split(",")).map(_.trim).filter(_.nonEmpty)
    val geo = scalar(h, "GEO").map(_.v.split(";"))
    val lastMod = scalar(h, "LAST-MODIFIED").flatMap { e =>
      try Some(Timestamp.from(IcsTime.parseDateTime(e)._1)) catch { case _: Exception => None }
    }
    EventRow(
      compound_identity = s"$calendarId-$uid",
      calendar_external_id = calendarId,
      uid = uid,
      status = scalar(h, "STATUS").map(_.v),
      start_at = startAt.map(Timestamp.from),
      end_at = endAt.map(Timestamp.from),
      start_date = startDate.map(SqlDate.valueOf),
      end_date = endDate.map(SqlDate.valueOf),
      missing_timezone = missingTz,
      categories = categories,
      priority = scalar(h, "PRIORITY").flatMap(e => e.v.toIntOption),
      classification = scalar(h, "CLASS").map(_.v),
      geo_lat = geo.flatMap(_.headOption).flatMap(_.toDoubleOption),
      geo_lng = geo.flatMap(g => g.lift(1)).flatMap(_.toDoubleOption),
      recurring_event_id = None,
      recurring_event_sequence = seq,
      last_modified_at = lastMod,
      data = renderData(h))
  }

  /** Distributed expansion: (calendar_external_id, ics_text) feeds ->
    * event rows, one feed per task. */
  def expandDataset(feeds: Dataset[(String, String)], now: Instant): Dataset[EventRow] = {
    val spark = feeds.sparkSession
    import spark.implicits._
    feeds.flatMap { case (calId, ics) => expandFeed(calId, ics, now) }
  }

  /** R1+R2 reconciliation across ALL calendars present in `upserted` —
    * the batch form used when a whole wave of feeds re-syncs in one job
    * (each calendar's feed is authoritative for that calendar's rows).
    * Callers that sync a single feed use [[reconcile]]. */
  def reconcileFeeds(current: DataFrame, upserted: DataFrame): DataFrame = {
    val synced = broadcast(
      upserted.select(col("calendar_external_id")).distinct()
        .withColumn("__synced", lit(true)))
    val scoped = current.join(synced, Seq("calendar_external_id"), "left")
    val cancelled = Reconcile.cancelMissing(
      scoped,
      upserted.select(col("compound_identity")),
      keyCol = "compound_identity",
      statusCol = "status", cancelledValue = "CANCELLED",
      scope = col("__synced").isNotNull)
      .select(current.columns.map(col): _*)
    val maxSeen = upserted
      .filter(col("recurring_event_sequence").isNotNull)
      .groupBy(col("recurring_event_id"))
      .agg(max(col("recurring_event_sequence")).as("max_seq"))
    Reconcile.deleteStaleSequences(cancelled, maxSeen,
      groupCol = "recurring_event_id", seqCol = "recurring_event_sequence",
      maxSeqCol = "max_seq")
  }

  /** R1+R2 post-sync reconciliation for one calendar: rows of `current`
    * (scoped to the calendar) not among the upserted identities and not
    * already cancelled flip to CANCELLED; stale sequence tails are dropped. */
  def reconcile(current: DataFrame, upserted: DataFrame,
                calendarId: String): DataFrame = {
    val cancelled = Reconcile.cancelMissing(
      current,
      upserted.select(col("compound_identity")),
      keyCol = "compound_identity",
      statusCol = "status", cancelledValue = "CANCELLED",
      scope = col("calendar_external_id") === calendarId)
    val maxSeen = upserted
      .filter(col("recurring_event_sequence").isNotNull)
      .groupBy(col("recurring_event_id").as("recurring_event_id"))
      .agg(max(col("recurring_event_sequence")).as("max_seq"))
    Reconcile.deleteStaleSequences(cancelled, maxSeen,
      groupCol = "recurring_event_id", seqCol = "recurring_event_sequence",
      maxSeqCol = "max_seq")
  }
}

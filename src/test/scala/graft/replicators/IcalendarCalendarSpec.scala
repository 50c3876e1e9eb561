package graft.replicators

import graft.SparkSpec
import graft.operators.{Pipeline, Projection}
import org.apache.spark.sql.functions._
import java.time.Instant

/** Calendar command protocol (SYNC/DELETE), webcal rewrite, R4 cascade,
  * full feed-sync round trip with reconciliation. */
class IcalendarCalendarSpec extends SparkSpec {
  import spark.implicits._

  private val now = Instant.parse("2024-06-01T00:00:00Z")

  private def cmds(bodies: String*) =
    bodies.zipWithIndex.map { case (b, i) => (b, i.toLong) }
      .toDF("body", Projection.IngestSeqCol)

  private val feed =
    """BEGIN:VCALENDAR
      |BEGIN:VEVENT
      |UID:ev1
      |DTSTART:20240210T100000Z
      |STATUS:CONFIRMED
      |END:VEVENT
      |BEGIN:VEVENT
      |UID:ev2
      |DTSTART:20240211T100000Z
      |STATUS:CONFIRMED
      |END:VEVENT
      |END:VCALENDAR""".stripMargin

  test("SYNC upserts calendars with webcal rewrite; DELETE cascades to events") {
    val cal0 = Pipeline.emptyTarget(IcalendarCalendar.spec, spark)
    val ev0 = IcalendarEvents.expandDataset(
      Seq(("cal-1", feed), ("cal-2", feed)).toDS(), now).toDF()

    val (cal1, ev1) = IcalendarCalendar.processCommands(spark, cal0, ev0,
      cmds("""{"type":"SYNC","external_id":"cal-1","ics_url":"webcal://x/feed.ics"}""",
        """{"type":"SYNC","external_id":"cal-2","ics_url":"https://y/feed.ics"}"""))
    assert(cal1.count() == 2)
    val c1 = cal1.filter(col("external_id") === "cal-1").collect()(0)
    assert(c1.getAs[String]("ics_url") == "https://x/feed.ics") // webcal rewritten
    assert(c1.getAs[java.sql.Timestamp]("row_created_at") != null)

    val (cal2, ev2) = IcalendarCalendar.processCommands(spark, cal1, ev1,
      cmds("""{"type":"DELETE","external_id":"cal-1"}"""))
    assert(cal2.select("external_id").as[String].collect().toSeq == Seq("cal-2"))
    assert(ev2.filter(col("calendar_external_id") === "cal-1").count() == 0) // R4
    assert(ev2.filter(col("calendar_external_id") === "cal-2").count() == 2)
  }

  test("feed sync merges, reconciles and stamps last_synced_at") {
    val cal0 = Pipeline.upsertBatch(IcalendarCalendar.spec,
      Pipeline.emptyTarget(IcalendarCalendar.spec, spark),
      cmds("""{"type":"SYNC","external_id":"cal-1","ics_url":"https://x/f.ics"}"""))
    val ev0 = Pipeline.emptyTarget(
      graft.operators.ReplicatorSpec("tmp", "compound_identity", Seq()), spark)
    // first sync: bootstrap events from an empty table with matching schema
    val boot = IcalendarEvents.expandDataset(Seq(("cal-1", feed)).toDS(), now).toDF()
    val (cal1, ev1) = IcalendarCalendar.syncFeed(spark, cal0,
      boot.limit(0), "cal-1", feed, now)
    assert(ev1.count() == 2)
    assert(cal1.filter(col("external_id") === "cal-1")
      .select("last_synced_at").collect()(0).get(0) != null)

    // second sync: ev2 vanished from the feed -> cancelled
    val shrunk = feed.replaceAll("(?s)BEGIN:VEVENT\nUID:ev2.*?END:VEVENT\n", "")
    val (_, ev2) = IcalendarCalendar.syncFeed(spark, cal1, ev1, "cal-1", shrunk,
      now.plusSeconds(3600))
    val statuses = ev2.select("compound_identity", "status")
      .as[(String, String)].collect().toMap
    assert(statuses("cal-1-ev1") == "CONFIRMED")
    assert(statuses("cal-1-ev2") == "CANCELLED")
  }

  test("feeds refetch every 6h with a bounded deterministic splay") {
    val now = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    def hoursAgo(h: Int) = new java.sql.Timestamp(now.getTime - h * 3600000L)
    val cals = Seq(
      ("cal-due", Some(hoursAgo(7))),
      ("cal-edge", Some(hoursAgo(6))),   // exactly 6h -> due (<=)
      ("cal-fresh", Some(hoursAgo(1))),
      ("cal-never", None))               // never fetched -> due
      .toDF("external_id", "last_synced_at")
    val due = IcalendarCalendar.dueForRefresh(cals, now)
    val rows = due.select("external_id", "start_delay_seconds")
      .as[(String, Long)].collect().toMap
    assert(rows.keySet == Set("cal-due", "cal-edge", "cal-never"))
    assert(rows.values.forall(s => s >= 0 && s < IcalendarCalendar.MaxSplaySeconds))
    // deterministic: same inputs, same splays
    val again = IcalendarCalendar.dueForRefresh(cals, now)
      .select("external_id", "start_delay_seconds").as[(String, Long)].collect().toMap
    assert(rows == again)
  }
}

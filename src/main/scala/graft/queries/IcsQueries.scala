package graft.queries

import graft.Tables
import graft.operators.{Merge, MergeSpec}
import graft.replicators.IcalendarEvents
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.time.Instant

/** The iCalendar vertical under the oracle gate (G1/S6/E16/E17/E18/R1/R2 —
  * `icalendar_calendar_v1.rb:466-643`, `icalendar_event_v1.rb:37-206`).
  *
  * A deterministic ICS corpus is generated per customer row (so DuckDB can
  * recompute every expected occurrence arithmetically), then parsed and
  * expanded by the REAL engine path: `Ics.parseFeed` -> RRULE projection ->
  * exception identity stealing -> in-batch last-wins dedup (U4) -> (q71)
  * full-feed reconciliation.
  *
  * Corpus per customer k (calendar `cal-k`):
  *  - event A `ev-k-a`: weekly 09:00 America/New_York (DST-stable June
  *    window so the oracle can use a constant UTC-4 offset), COUNT=2+k%5,
  *    DTEND +90min; EXDATE of the 2nd occurrence when k%3=0; a
  *    RECURRENCE-ID exception moving the 2nd occurrence +1h when k%4=0
  *    (identity stealing when the occurrence exists; out-of-rule sequence
  *    extension when k%12=0 because the EXDATE removed it).
  *  - event B `ev-k-b`: all-day date event, implicit DTEND +1 day (E18).
  *  - event C `ev-k-c`: FREQ=MONTHLY;BYDAY=TU (ordinal-0 = EVERY Tuesday —
  *    the RFC 5545 semantic), COUNT=4+k%4, implicit end = start.
  *  - event D `ev-k-d` (k%5=0): unknown TZID -> UTC fallback with
  *    missing_timezone=true (E17).
  */
object IcsQueries {

  type Q = (SparkSession, String) => DataFrame

  private val Now = Instant.parse("2024-06-01T00:00:00Z")

  private def pad2(n: Long): String = f"$n%02d"

  /** Event A lines (weekly TZID series). */
  private def eventA(k: Long, count: Long, exdate: Boolean): String = {
    val dayA = 2 + k % 7
    val sb = new StringBuilder
    sb ++= s"BEGIN:VEVENT\nUID:ev-$k-a\n"
    sb ++= s"DTSTART;TZID=America/New_York:202406${pad2(dayA)}T090000\n"
    sb ++= s"DTEND;TZID=America/New_York:202406${pad2(dayA)}T103000\n"
    sb ++= s"RRULE:FREQ=WEEKLY;COUNT=$count\n"
    if (exdate)
      sb ++= s"EXDATE;TZID=America/New_York:202406${pad2(dayA + 7)}T090000\n"
    sb ++= "STATUS:CONFIRMED\nEND:VEVENT\n"
    sb.toString
  }

  /** Exception event for A's 2nd occurrence, moved +1h (RECURRENCE-ID). */
  private def eventAException(k: Long): String = {
    val dayA = 2 + k % 7
    s"""BEGIN:VEVENT
       |UID:ev-$k-a
       |RECURRENCE-ID;TZID=America/New_York:202406${pad2(dayA + 7)}T090000
       |DTSTART;TZID=America/New_York:202406${pad2(dayA + 7)}T100000
       |STATUS:TENTATIVE
       |END:VEVENT
       |""".stripMargin
  }

  private def eventB(k: Long): String = {
    val month = 1 + k % 12
    val day = 1 + k % 27
    s"BEGIN:VEVENT\nUID:ev-$k-b\nDTSTART;VALUE=DATE:2024${pad2(month)}${pad2(day)}\nSTATUS:TENTATIVE\nEND:VEVENT\n"
  }

  private def eventC(k: Long): String =
    s"BEGIN:VEVENT\nUID:ev-$k-c\nDTSTART:20240102T100000Z\nRRULE:FREQ=MONTHLY;BYDAY=TU;COUNT=${4 + k % 4}\nSTATUS:CONFIRMED\nEND:VEVENT\n"

  private def eventD(k: Long): String =
    s"BEGIN:VEVENT\nUID:ev-$k-d\nDTSTART;TZID=Mars/Olympus:20240301T120000\nSTATUS:CONFIRMED\nEND:VEVENT\n"

  /** q70 feed: the full corpus. */
  private def feedQ70(k: Long): String = {
    val sb = new StringBuilder("BEGIN:VCALENDAR\n")
    sb ++= eventA(k, count = 2 + k % 5, exdate = k % 3 == 0)
    sb ++= eventB(k)
    sb ++= eventC(k)
    if (k % 5 == 0) sb ++= eventD(k)
    if (k % 4 == 0) sb ++= eventAException(k)
    sb ++= "END:VCALENDAR\n"
    sb.toString
  }

  /** q71 v1 feed (the stored snapshot): A full-length + B + D. */
  private def feedV1(k: Long): String = {
    val sb = new StringBuilder("BEGIN:VCALENDAR\n")
    sb ++= eventA(k, count = 2 + k % 5, exdate = false)
    sb ++= eventB(k)
    if (k % 5 == 0) sb ++= eventD(k)
    sb ++= "END:VCALENDAR\n"
    sb.toString
  }

  /** q71 v2 feed (the re-sync): A shrunk to 2+(k%5)/2, B only for even k. */
  private def feedV2(k: Long): String = {
    val sb = new StringBuilder("BEGIN:VCALENDAR\n")
    sb ++= eventA(k, count = 2 + (k % 5) / 2, exdate = false)
    if (k % 2 == 0) sb ++= eventB(k)
    sb ++= "END:VCALENDAR\n"
    sb.toString
  }

  /** Expand feeds built by `mk` through the real engine path, with the U4
    * last-wins dedup that lets RECURRENCE-ID exceptions replace the stolen
    * occurrence row. One feed expands per task (map-side); the only shuffle
    * is the dedup window on the merge key — the production merge shape. */
  private def expand(spark: SparkSession, d: String, mk: Long => String): DataFrame = {
    import spark.implicits._
    val feeds = Tables.parallel(Tables.customer(spark, d)
      .select(col("c_custkey").cast("long"))).as[Long]
      .map(k => ("cal-" + k, mk(k)))
    val rows = feeds.flatMap { case (cal, ics) =>
      IcalendarEvents.expandFeed(cal, ics, Now).zipWithIndex
        .map { case (r, i) => (r, i.toLong) }
    }.toDF("row", "__ingest")
    val flat = rows.select(col("row.*"), col("__ingest"))
    Merge.dedupLastWins(flat,
        MergeSpec(keyCols = Seq("compound_identity"), orderCol = "__ingest"))
      .drop("__ingest")
  }

  private def shape(df: DataFrame): DataFrame =
    df.select(
      col("compound_identity"), col("calendar_external_id"), col("uid"),
      col("recurring_event_id"), col("recurring_event_sequence"),
      col("status"),
      unix_millis(col("start_at")).as("start_ms"),
      unix_millis(col("end_at")).as("end_ms"),
      // dates as ISO strings: cross-engine date dtypes disagree in the
      // compare harness (date32 vs datetime64); strings are precision-proof
      date_format(col("start_date"), "yyyy-MM-dd").as("start_date"),
      date_format(col("end_date"), "yyyy-MM-dd").as("end_date"),
      col("missing_timezone"))
      .orderBy(col("compound_identity"))

  /** q70 — ICS parse + RRULE expansion + exceptions, oracle-checked. */
  def q70(spark: SparkSession, d: String): DataFrame =
    shape(expand(spark, d, feedQ70))

  /** q71 — full-feed reconciliation (R1 cancel-missing + R2 stale-sequence
    * delete): v1 snapshot reconciled against the v2 re-sync. */
  def q71(spark: SparkSession, d: String): DataFrame = {
    val current = expand(spark, d, feedV1)
    val upserted = expand(spark, d, feedV2)
    shape(IcalendarEvents.reconcileFeeds(current, upserted))
  }

  // ---- DuckDB oracles: recompute every occurrence arithmetically ----
  // Constants: 09:00 America/New_York in June = 13:00 UTC (EDT, UTC-4);
  // 7 days = 604800000 ms; 90 min = 5400000 ms; 1 h = 3600000 ms.

  private val q70Sql: String = """
    WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
    nums AS (SELECT unnest(range(7)) AS i),
    a_surv AS (
      SELECT k, i, CAST(row_number() OVER (PARTITION BY k ORDER BY i) - 1 AS INTEGER) AS seq
      FROM c CROSS JOIN nums
      WHERE i < 2 + k % 5 AND NOT (k % 3 = 0 AND i = 1)
    ),
    a_rows AS (
      SELECT
        'cal-' || k || '-ev-' || k || '-a-' || seq AS compound_identity,
        'cal-' || k AS calendar_external_id,
        'ev-' || k || '-a-' || seq AS uid,
        'ev-' || k || '-a' AS recurring_event_id,
        seq AS recurring_event_sequence,
        CASE WHEN k % 4 = 0 AND k % 3 <> 0 AND i = 1 THEN 'TENTATIVE' ELSE 'CONFIRMED' END AS status,
        epoch_ms(TIMESTAMP '2024-06-02 13:00:00') + (k % 7) * 86400000 + i * 604800000
          + CASE WHEN k % 4 = 0 AND k % 3 <> 0 AND i = 1 THEN 3600000 ELSE 0 END AS start_ms,
        epoch_ms(TIMESTAMP '2024-06-02 13:00:00') + (k % 7) * 86400000 + i * 604800000
          + CASE WHEN k % 4 = 0 AND k % 3 <> 0 AND i = 1 THEN 3600000 ELSE 5400000 END AS end_ms,
        CAST(NULL AS VARCHAR) AS start_date, CAST(NULL AS VARCHAR) AS end_date,
        FALSE AS missing_timezone
      FROM a_surv
    ),
    a_extra AS ( -- out-of-rule exception: EXDATE removed the target occurrence
      SELECT
        'cal-' || k || '-ev-' || k || '-a-' || (1 + k % 5) AS compound_identity,
        'cal-' || k AS calendar_external_id,
        'ev-' || k || '-a-' || (1 + k % 5) AS uid,
        'ev-' || k || '-a' AS recurring_event_id,
        CAST(1 + k % 5 AS INTEGER) AS recurring_event_sequence,
        'TENTATIVE' AS status,
        epoch_ms(TIMESTAMP '2024-06-02 13:00:00') + (k % 7) * 86400000 + 604800000 + 3600000 AS start_ms,
        epoch_ms(TIMESTAMP '2024-06-02 13:00:00') + (k % 7) * 86400000 + 604800000 + 3600000 AS end_ms,
        CAST(NULL AS VARCHAR) AS start_date, CAST(NULL AS VARCHAR) AS end_date,
        FALSE AS missing_timezone
      FROM c WHERE k % 12 = 0
    ),
    b_rows AS (
      SELECT
        'cal-' || k || '-ev-' || k || '-b' AS compound_identity,
        'cal-' || k AS calendar_external_id,
        'ev-' || k || '-b' AS uid,
        CAST(NULL AS VARCHAR) AS recurring_event_id,
        CAST(NULL AS INTEGER) AS recurring_event_sequence,
        'TENTATIVE' AS status,
        CAST(NULL AS BIGINT) AS start_ms, CAST(NULL AS BIGINT) AS end_ms,
        strftime(make_date(2024, CAST(1 + k % 12 AS INTEGER), CAST(1 + k % 27 AS INTEGER)), '%Y-%m-%d') AS start_date,
        strftime(make_date(2024, CAST(1 + k % 12 AS INTEGER), CAST(1 + k % 27 AS INTEGER)) + 1, '%Y-%m-%d') AS end_date,
        FALSE AS missing_timezone
      FROM c
    ),
    c_rows AS (
      SELECT
        'cal-' || k || '-ev-' || k || '-c-' || i AS compound_identity,
        'cal-' || k AS calendar_external_id,
        'ev-' || k || '-c-' || i AS uid,
        'ev-' || k || '-c' AS recurring_event_id,
        CAST(i AS INTEGER) AS recurring_event_sequence,
        'CONFIRMED' AS status,
        epoch_ms(TIMESTAMP '2024-01-02 10:00:00') + i * 604800000 AS start_ms,
        epoch_ms(TIMESTAMP '2024-01-02 10:00:00') + i * 604800000 AS end_ms,
        CAST(NULL AS VARCHAR) AS start_date, CAST(NULL AS VARCHAR) AS end_date,
        FALSE AS missing_timezone
      FROM c CROSS JOIN nums WHERE i < 4 + k % 4
    ),
    d_rows AS (
      SELECT
        'cal-' || k || '-ev-' || k || '-d' AS compound_identity,
        'cal-' || k AS calendar_external_id,
        'ev-' || k || '-d' AS uid,
        CAST(NULL AS VARCHAR) AS recurring_event_id,
        CAST(NULL AS INTEGER) AS recurring_event_sequence,
        'CONFIRMED' AS status,
        epoch_ms(TIMESTAMP '2024-03-01 12:00:00') AS start_ms,
        epoch_ms(TIMESTAMP '2024-03-01 12:00:00') AS end_ms,
        CAST(NULL AS VARCHAR) AS start_date, CAST(NULL AS VARCHAR) AS end_date,
        TRUE AS missing_timezone
      FROM c WHERE k % 5 = 0
    )
    SELECT * FROM a_rows UNION ALL SELECT * FROM a_extra
    UNION ALL SELECT * FROM b_rows UNION ALL SELECT * FROM c_rows
    UNION ALL SELECT * FROM d_rows
    ORDER BY compound_identity"""

  private val q71Sql: String = """
    WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
    nums AS (SELECT unnest(range(7)) AS i),
    a_rows AS ( -- survivors: v1 rows with seq < v2 count (stale tail deleted)
      SELECT
        'cal-' || k || '-ev-' || k || '-a-' || i AS compound_identity,
        'cal-' || k AS calendar_external_id,
        'ev-' || k || '-a-' || i AS uid,
        'ev-' || k || '-a' AS recurring_event_id,
        CAST(i AS INTEGER) AS recurring_event_sequence,
        'CONFIRMED' AS status,
        epoch_ms(TIMESTAMP '2024-06-02 13:00:00') + (k % 7) * 86400000 + i * 604800000 AS start_ms,
        epoch_ms(TIMESTAMP '2024-06-02 13:00:00') + (k % 7) * 86400000 + i * 604800000 + 5400000 AS end_ms,
        CAST(NULL AS VARCHAR) AS start_date, CAST(NULL AS VARCHAR) AS end_date,
        FALSE AS missing_timezone
      FROM c CROSS JOIN nums WHERE i < 2 + (k % 5) // 2
    ),
    b_rows AS ( -- cancelled for odd k (missing from the v2 feed)
      SELECT
        'cal-' || k || '-ev-' || k || '-b' AS compound_identity,
        'cal-' || k AS calendar_external_id,
        'ev-' || k || '-b' AS uid,
        CAST(NULL AS VARCHAR) AS recurring_event_id,
        CAST(NULL AS INTEGER) AS recurring_event_sequence,
        CASE WHEN k % 2 = 0 THEN 'TENTATIVE' ELSE 'CANCELLED' END AS status,
        CAST(NULL AS BIGINT) AS start_ms, CAST(NULL AS BIGINT) AS end_ms,
        strftime(make_date(2024, CAST(1 + k % 12 AS INTEGER), CAST(1 + k % 27 AS INTEGER)), '%Y-%m-%d') AS start_date,
        strftime(make_date(2024, CAST(1 + k % 12 AS INTEGER), CAST(1 + k % 27 AS INTEGER)) + 1, '%Y-%m-%d') AS end_date,
        FALSE AS missing_timezone
      FROM c
    ),
    d_rows AS ( -- always cancelled: absent from every v2 feed
      SELECT
        'cal-' || k || '-ev-' || k || '-d' AS compound_identity,
        'cal-' || k AS calendar_external_id,
        'ev-' || k || '-d' AS uid,
        CAST(NULL AS VARCHAR) AS recurring_event_id,
        CAST(NULL AS INTEGER) AS recurring_event_sequence,
        'CANCELLED' AS status,
        epoch_ms(TIMESTAMP '2024-03-01 12:00:00') AS start_ms,
        epoch_ms(TIMESTAMP '2024-03-01 12:00:00') AS end_ms,
        CAST(NULL AS VARCHAR) AS start_date, CAST(NULL AS VARCHAR) AS end_date,
        TRUE AS missing_timezone
      FROM c WHERE k % 5 = 0
    )
    SELECT * FROM a_rows UNION ALL SELECT * FROM b_rows UNION ALL SELECT * FROM d_rows
    ORDER BY compound_identity"""

  /** q79 — the calendar webhook COMMAND protocol + R4 delete cascade
    * (`icalendar_calendar_v1.rb:114-153`): SYNC commands upsert calendar
    * rows (with the webcal->https url rewrite, E11); DELETE commands for
    * k%5=0 drop the calendar row AND its dependent event rows in one pass. */
  def q79(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.operators.{Pipeline, Projection}
    import graft.replicators.IcalendarCalendar
    val custs = Tables.customer(spark, d).select(col("c_custkey").cast("long").as("k"))
    val syncs = custs.select(
      concat(lit("""{"type":"SYNC","external_id":"cal-"""), col("k"),
        lit("""","ics_url":"webcal://feeds.example/"""), col("k"),
        lit(""".ics"}""")).as("body"),
      col("k").as(Projection.IngestSeqCol))
    val deletes = custs.filter(col("k") % 5 === 0).select(
      concat(lit("""{"type":"DELETE","external_id":"cal-"""), col("k"),
        lit(""""}""")).as("body"),
      (col("k") + 1000000L).as(Projection.IngestSeqCol))
    val commands = syncs.unionByName(deletes)
    // two dependent event rows per calendar
    val events = custs.select(col("k"),
        concat(lit("cal-"), col("k")).as("calendar_external_id"))
      .crossJoin(Seq(0, 1).toDF("j"))
      .select(col("calendar_external_id"),
        concat(lit("ev-"), col("k"), lit("-"), col("j")).as("uid"))
    val (cals, evs) = IcalendarCalendar.processCommands(spark,
      Pipeline.emptyTarget(IcalendarCalendar.spec, spark), events, commands)
    val counts = evs.groupBy(col("calendar_external_id"))
      .agg(count(lit(1)).as("n_events"))
    cals.select(col("external_id"), col("ics_url"))
      .join(counts, col("external_id") === col("calendar_external_id"), "left")
      .select(col("external_id"), col("ics_url"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("external_id"))
  }

  private val q79Sql: String = """
    SELECT 'cal-' || CAST(c_custkey AS BIGINT) AS external_id,
      'https://feeds.example/' || CAST(c_custkey AS BIGINT) || '.ics' AS ics_url,
      CAST(2 AS BIGINT) AS n_events
    FROM customer WHERE c_custkey % 5 <> 0
    ORDER BY external_id"""

  val defs: Map[String, Q] = Map(
    "q70_ics_expansion" -> (q70 _),
    "q71_ics_reconcile" -> (q71 _),
    "q79_calendar_commands" -> (q79 _))

  val oracles: Map[String, String] = Map(
    "q70_ics_expansion" -> q70Sql,
    "q71_ics_reconcile" -> q71Sql,
    "q79_calendar_commands" -> q79Sql)
}

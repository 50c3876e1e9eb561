package graft.queries

import graft.Tables
import graft.plans.ReadonlyGuard
import graft.sinks.{Notify, SyncTarget}
import graft.sources.Scheduler
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import java.time.{Instant, LocalDateTime}

/** The sync/notify/guard/scheduler protocol family under the oracle gate,
  * closing the last ScalaTest-only rows of SURVEY §2:
  *  - q80: I1/I5/I6 — the ordered page protocol of `SyncTarget.sync`
  *    (incremental window scan, 200-row pages, maxPages soft cap);
  *  - q81: K4 — the notify delivery ledger (content-addressed delivery ids,
  *    bounded attempts across waves);
  *  - q82: I3 — the readonly row cap with `max_rows_reached`;
  *  - q83: I7/I8 — due-scheduling scan + rows_needing_sync;
  *  - q84: S10 — scheduled-poller tick fan-out over the reference's cron
  *    spec table (the due set for the audited window is pinned in the
  *    oracle as a golden list; the splay column is engine-side only since
  *    xxhash64 has no DuckDB equivalent).
  */
object ProtocolQueries {

  type Q = (SparkSession, String) => DataFrame

  private def ts(iso: String): Timestamp =
    new Timestamp(Instant.parse(iso).toEpochMilli)

  // ---- q80: sync page protocol ----

  def q80(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
      .select(col("event_id"), col("ts"), unix_micros(col("ts")).as("ts_us"))
    val pages = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val sink = new SyncTarget.PageSink {
      def writePage(page: Seq[Row], pageIdx: Long): Unit =
        page.foreach(r => pages += ((pageIdx, r.getLong(0), r.getLong(2))))
    }
    val res = SyncTarget.sync(e, "ts",
      ts("2024-01-10T00:00:00Z"), ts("2024-01-15T00:00:00Z"),
      pageSize = 200, sink, maxPages = 50)
    require(res.failure.isEmpty)
    import spark.implicits._
    pages.toSeq.toDF("page_idx", "event_id", "ts_us")
      .groupBy(col("page_idx"))
      .agg(count(lit(1)).as("n_rows"), min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us"), sum(col("event_id")).as("sum_ids"))
      .orderBy(col("page_idx"))
  }

  private val q80Sql: String = """
    WITH w AS (
      SELECT event_id, ts, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
        AND CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-15 00:00:00'),
    r AS (SELECT *, row_number() OVER (ORDER BY ts) - 1 AS rn FROM w)
    SELECT rn // 200 AS page_idx, count(*) AS n_rows,
      min(ts_us) AS min_ts_us, max(ts_us) AS max_ts_us,
      CAST(sum(event_id) AS BIGINT) AS sum_ids
    FROM r WHERE rn // 200 < 50
    GROUP BY 1 ORDER BY 1"""

  // ---- q81: notify delivery ledger ----

  /** Deterministic transport: payload is `{"k":"<event_id>"}`; the delivery
    * succeeds on wave `event_id % 4` (so %4==3 exhausts all three waves
    * undelivered). */
  private final case class WaveTransport(wave: Int) extends Notify.Transport {
    def post(url: String, payload: String): Boolean =
      payload.filter(_.isDigit).toLong % 4 == wave
  }

  def q81(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val changed = Tables.events(spark, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").cast("string").as("k"))
    val subs = Seq(
      ("sub-a", "https://a.example/hook", true),
      ("sub-b", "https://b.example/hook", true),
      ("sub-c", "https://c.example/hook", false))
      .toDF("subscription_id", "url", "active")
    var ledger = Notify.enqueueDeliveries(changed, subs, "events_purchase")
    for (w <- 0 until 3) ledger = Notify.attemptWave(ledger, WaveTransport(w))
    ledger.select(col("delivery_id"), col("subscription_id"),
        col("attempts").cast("long").as("attempts"),
        col("delivered_at").isNotNull.as("delivered"))
      .orderBy(col("delivery_id"), col("subscription_id"))
  }

  private val q81Sql: String = """
    WITH ch AS (SELECT CAST(event_id AS VARCHAR) AS k, event_id
                FROM events WHERE event_type = 'purchase'),
    subs(subscription_id) AS (VALUES ('sub-a'), ('sub-b')),
    d AS (
      SELECT md5(subscription_id || '|events_purchase|{"k":"' || k || '"}') AS delivery_id,
        subscription_id, event_id % 4 AS m
      FROM ch CROSS JOIN subs)
    SELECT delivery_id, subscription_id,
      CAST(CASE WHEN m < 3 THEN m + 1 ELSE 3 END AS BIGINT) AS attempts,
      m < 3 AS delivered
    FROM d ORDER BY delivery_id, subscription_id"""

  // ---- q82: readonly row cap ----

  def q82(spark: SparkSession, d: String): DataFrame = {
    Tables.events(spark, d).createOrReplaceTempView("events_guard_q82")
    val res = ReadonlyGuard.run(spark,
      "SELECT event_id, user_id FROM events_guard_q82 ORDER BY event_id",
      maxRows = 500)
    res.df.withColumn("max_rows_reached", lit(res.maxRowsReached))
      .orderBy(col("event_id"))
  }

  private val q82Sql: String = """
    SELECT event_id, user_id,
      (SELECT count(*) FROM events) > 500 AS max_rows_reached
    FROM events ORDER BY event_id LIMIT 500"""

  // ---- q83: due-scheduling scan + rows_needing_sync ----

  private val BaseEpochSec = 1717200000L // 2024-06-01T00:00:00Z

  def q83(spark: SparkSession, d: String): DataFrame = {
    val targets = Tables.customer(spark, d).select(
      col("c_custkey").cast("long").as("k"),
      when(col("c_custkey") % 97 === 0, lit(null).cast("timestamp"))
        .otherwise(timestamp_seconds(lit(BaseEpochSec) + (col("c_custkey") % 1000) * 60))
        .as("last_synced_at"),
      ((col("c_custkey") % 6 + 1) * 600).cast("long").as("period_sec"))
    val now = new Timestamp((BaseEpochSec + 500 * 60) * 1000)
    val cutoff = new Timestamp((BaseEpochSec + 300 * 60) * 1000)
    val due = SyncTarget.dueForSync(targets, "last_synced_at", "period_sec", now)
    val needs = SyncTarget.rowsNeedingSync(targets, "last_synced_at", cutoff)
      .select(col("k").as("nk"))
    due.join(needs, col("k") === col("nk"), "left")
      .select(col("k"), col("period_sec"), col("nk").isNotNull.as("needs_resync"))
      .orderBy(col("k"))
  }

  private val q83Sql: String = """
    WITH t AS (
      SELECT CAST(c_custkey AS BIGINT) AS k,
        CASE WHEN c_custkey % 97 = 0 THEN NULL
             ELSE to_timestamp(1717200000 + (c_custkey % 1000) * 60) END AS last_synced_at,
        CAST((c_custkey % 6 + 1) * 600 AS BIGINT) AS period_sec
      FROM customer)
    SELECT k, period_sec,
      (last_synced_at IS NULL OR last_synced_at < to_timestamp(1717200000 + 300 * 60))
        AS needs_resync
    FROM t
    WHERE last_synced_at IS NULL
       OR last_synced_at <= to_timestamp(1717200000 + 500 * 60 - period_sec)
    ORDER BY k"""

  // ---- q84: scheduler tick fan-out ----

  def q84(spark: SparkSession, d: String): DataFrame = {
    val names = Scheduler.Specs.map(_.serviceName)
    val integrations = Tables.customer(spark, d).select(
      col("c_custkey").cast("long").as("integration_id"),
      element_at(array(names.map(lit): _*),
        (col("c_custkey") % 12 + 1).cast("int")).as("service_name"))
    Scheduler.enqueueDue(spark, integrations, Scheduler.Specs,
        LocalDateTime.of(2024, 6, 3, 4, 0), LocalDateTime.of(2024, 6, 3, 5, 0))
      .select(col("integration_id"), col("service_name"),
        col("incremental"), col("recursive"))
      .orderBy(col("integration_id"))
  }

  /** The due set for [04:00, 05:00) is pinned by hand from the cron table:
    * every spec fires in that window except `transistor_show_v1`, whose
    * cron restricts it to hour 0 only. */
  private val q84Sql: String = """
    WITH due(idx, service_name, incremental, recursive) AS (VALUES
      (0, 'convertkit_broadcast_v1', false, false),
      (1, 'convertkit_subscriber_v1', true, false),
      (2, 'convertkit_tag_v1', false, false),
      (3, 'email_octopus_list_v1', false, true),
      (4, 'github_repository_event_v1', false, false),
      (5, 'intercom_marketplace_root_v1', true, true),
      (6, 'atom_single_feed_v1', true, false),
      (7, 'sponsy_publication_v1', true, true),
      (8, 'transistor_episode_v1', true, true),
      (10, 'twilio_sms_v1', true, true),
      (11, 'signalwire_message_v1', true, true))
    SELECT CAST(c_custkey AS BIGINT) AS integration_id, service_name,
      incremental, recursive
    FROM customer JOIN due ON (c_custkey % 12) = idx
    ORDER BY integration_id"""

  val defs: Map[String, Q] = Map(
    "q80_sync_pages" -> (q80 _),
    "q81_notify_ledger" -> (q81 _),
    "q82_row_cap" -> (q82 _),
    "q83_due_scan" -> (q83 _),
    "q84_scheduler_fanout" -> (q84 _))

  val oracles: Map[String, String] = Map(
    "q80_sync_pages" -> q80Sql,
    "q81_notify_ledger" -> q81Sql,
    "q82_row_cap" -> q82Sql,
    "q83_due_scan" -> q83Sql,
    "q84_scheduler_fanout" -> q84Sql)
}

package graft.sources

import graft.SparkSpec
import java.time.LocalDateTime

/** S10 contract: cron parse/next-fire, due-window scan, splayed fan-out
  * (`jobs/scheduled_backfills.rb:12-84`). */
class SchedulerSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = LocalDateTime.parse(s)

  test("cron parse and next-fire across field styles") {
    val hourly10 = Scheduler.parseCron("10 * * * *")
    assert(hourly10.nextAfter(t("2024-01-01T10:10:00")) == t("2024-01-01T11:10"))
    val every5 = Scheduler.parseCron("*/5 * * * *")
    assert(every5.nextAfter(t("2024-01-01T10:02:00")) == t("2024-01-01T10:05"))
    val daily446 = Scheduler.parseCron("46 4 * * *")
    assert(daily446.nextAfter(t("2024-01-01T05:00:00")) == t("2024-01-02T04:46"))
    val every4h = Scheduler.parseCron("0 */4 * * *")
    assert(every4h.nextAfter(t("2024-01-01T01:00:00")) == t("2024-01-01T04:00"))
    val sponsy = Scheduler.parseCron("*/30 */4 * * *")
    assert(sponsy.nextAfter(t("2024-01-01T04:30:00")) == t("2024-01-01T08:00"))
    // dow field: Monday=1
    val mondays = Scheduler.parseCron("0 9 * * 1")
    assert(mondays.nextAfter(t("2024-01-05T00:00:00")) == t("2024-01-08T09:00"))
  }

  test("every reference spec parses and fires") {
    Scheduler.Specs.foreach { s =>
      val n = s.cron.nextAfter(t("2024-01-01T00:00:00"))
      assert(n.isAfter(t("2024-01-01T00:00:00")), s.klass)
    }
    assert(Scheduler.Specs.size == 12)
  }

  test("due-window scan picks exactly the specs firing in the tick") {
    // window 10:08-10:13: hourly-at-:10 and :11 fire; every-minute fires;
    // daily 4:46 does not
    val due = Scheduler.dueSpecs(Scheduler.Specs,
      t("2024-01-01T10:08:00"), t("2024-01-01T10:13:00"))
    val names = due.map(_.klass).toSet
    assert(names.contains("ConvertkitBroadcastBackfill")) // 10 * * * *
    assert(names.contains("AtomSingleFeedPoller"))        // 11 * * * *
    assert(names.contains("TwilioSmsBackfill"))           // */1
    assert(!names.contains("IntercomScheduledBackfill"))  // 46 4 * * *
    assert(!names.contains("ConvertkitTagBackfill"))      // 30 * * * *
  }

  test("tick fan-out joins due specs to integrations with deterministic splay") {
    val integrations = Seq(
      ("i1", "twilio_sms_v1"), ("i2", "twilio_sms_v1"),
      ("i3", "atom_single_feed_v1"), ("i4", "stripe_charge_v1"))
      .toDF("integration_id", "service_name")
    val jobs = Scheduler.enqueueDue(spark, integrations, Scheduler.Specs,
      t("2024-01-01T10:11:00"), t("2024-01-01T10:12:00"))
    val rows = jobs.collect().map(r => r.getAs[String]("integration_id") ->
      (r.getAs[Boolean]("incremental"), r.getAs[Boolean]("recursive"),
        r.getAs[Long]("start_delay_seconds"))).toMap
    assert(rows.keySet == Set("i1", "i2", "i3")) // stripe has no poller spec
    assert(rows("i1")._1 && rows("i1")._2)       // twilio incremental+recursive
    assert(rows("i1")._3 == 0L)                  // twilio splay 0
    assert(rows("i3")._3 >= 0L && rows("i3")._3 < 10L) // atom splay < 10s
    // deterministic: same integration -> same delay on every tick
    val again = Scheduler.enqueueDue(spark, integrations, Scheduler.Specs,
      t("2024-01-01T10:11:00"), t("2024-01-01T10:12:00"))
      .collect().map(r => r.getAs[String]("integration_id") ->
        r.getAs[Long]("start_delay_seconds")).toMap
    assert(again("i3") == rows("i3")._3)
  }
}

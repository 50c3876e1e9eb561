package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.time.LocalDateTime

/** S10 — the scheduled-poller loop (`jobs/scheduled_backfills.rb:12-84` +
  * `async/scheduled_job.rb`): each polled service has a cron spec with a
  * splay (per-integration jitter so a fleet of integrations doesn't hit the
  * upstream API at the same instant), an incremental flag, and a recursive
  * flag (cascade through the dependency DAG).
  *
  * The loop itself is driver-side (a tick every scheduler period, like the
  * reference's sidekiq-cron); what's data-parallel is the fan-out: one tick
  * turns the due specs x their integrations into a DataFrame of backfill
  * jobs for the Backfiller/DependencyDag machinery.
  */
object Scheduler {

  /** One cron field: minute 0-59, hour 0-23, dom 1-31, month 1-12, dow 0-6. */
  private def parseField(s: String, min: Int, max: Int): Set[Int] = {
    def range(part: String): Seq[Int] = part match {
      case "*" => min to max
      case r if r.contains("/") =>
        val Array(base, step) = r.split("/", 2)
        range(base).zipWithIndex.collect { case (v, i) if i % step.toInt == 0 => v }
      case r if r.contains("-") =>
        val Array(a, b) = r.split("-", 2); a.toInt to b.toInt
      case v => Seq(v.toInt)
    }
    val vals = s.split(",").flatMap(range).toSet
    require(vals.forall(v => v >= min && v <= max), s"cron field out of range: $s")
    vals
  }

  /** A parsed 5-field cron expression. */
  final case class Cron(minute: Set[Int], hour: Set[Int], dayOfMonth: Set[Int],
                        month: Set[Int], dayOfWeek: Set[Int],
                        domWild: Boolean, dowWild: Boolean) {
    /** Does the expression fire at this minute? Standard cron dom/dow rule:
      * when BOTH are restricted, either matching fires. */
    def matches(t: LocalDateTime): Boolean = {
      val dateOk =
        if (domWild && dowWild) true
        else if (domWild) dayOfWeek.contains(t.getDayOfWeek.getValue % 7)
        else if (dowWild) dayOfMonth.contains(t.getDayOfMonth)
        else dayOfMonth.contains(t.getDayOfMonth) ||
          dayOfWeek.contains(t.getDayOfWeek.getValue % 7)
      minute.contains(t.getMinute) && hour.contains(t.getHour) &&
        month.contains(t.getMonthValue) && dateOk
    }

    /** First fire time strictly after `t` (minute granularity; bounded scan
      * — cron has at least one fire per 4 years). */
    def nextAfter(t: LocalDateTime): LocalDateTime = {
      var c = t.withSecond(0).withNano(0).plusMinutes(1)
      var steps = 0
      while (!matches(c) && steps < 4 * 366 * 24 * 60) {
        c = c.plusMinutes(1); steps += 1
      }
      require(matches(c), "cron never fires")
      c
    }
  }

  def parseCron(expr: String): Cron = {
    val f = expr.trim.split("\\s+")
    require(f.length == 5, s"need 5 cron fields: $expr")
    Cron(
      parseField(f(0), 0, 59), parseField(f(1), 0, 23), parseField(f(2), 1, 31),
      parseField(f(3), 1, 12), parseField(f(4), 0, 6),
      domWild = f(2) == "*", dowWild = f(4) == "*")
  }

  /** One service's scheduled-backfill spec (`scheduled_backfills.rb:12`). */
  final case class BackfillSpec(
      klass: String, serviceName: String, cronExpr: String,
      splaySeconds: Int, incremental: Boolean, recursive: Boolean) {
    lazy val cron: Cron = parseCron(cronExpr)
  }

  /** The reference's spec table (`scheduled_backfills.rb:31-84`; service
    * cron settings from `email_octopus.rb:13`, `github.rb:10`, `sponsy.rb:9`,
    * `transistor.rb:9-10`). */
  val Specs: Seq[BackfillSpec] = Seq(
    BackfillSpec("ConvertkitBroadcastBackfill", "convertkit_broadcast_v1", "10 * * * *", 120, incremental = false, recursive = false),
    BackfillSpec("ConvertkitSubscriberBackfill", "convertkit_subscriber_v1", "20 * * * *", 120, incremental = true, recursive = false),
    BackfillSpec("ConvertkitTagBackfill", "convertkit_tag_v1", "30 * * * *", 120, incremental = false, recursive = false),
    BackfillSpec("EmailOctopusScheduledBackfill", "email_octopus_list_v1", "0 */4 * * *", 120, incremental = false, recursive = true),
    BackfillSpec("GithubRepoActivityScheduledBackfill", "github_repository_event_v1", "*/5 * * * *", 30, incremental = false, recursive = false),
    BackfillSpec("IntercomScheduledBackfill", "intercom_marketplace_root_v1", "46 4 * * *", 0, incremental = true, recursive = true),
    BackfillSpec("AtomSingleFeedPoller", "atom_single_feed_v1", "11 * * * *", 10, incremental = true, recursive = false),
    BackfillSpec("SponsyScheduledBackfill", "sponsy_publication_v1", "*/30 */4 * * *", 30, incremental = true, recursive = true),
    BackfillSpec("TransistorEpisodeBackfill", "transistor_episode_v1", "30 * * * *", 120, incremental = true, recursive = true),
    BackfillSpec("TransistorShowBackfill", "transistor_show_v1", "0 0 */1 * *", 120, incremental = true, recursive = false),
    BackfillSpec("TwilioSmsBackfill", "twilio_sms_v1", "*/1 * * * *", 0, incremental = true, recursive = true),
    BackfillSpec("SignalwireMessageBackfill", "signalwire_message_v1", "*/1 * * * *", 0, incremental = true, recursive = true))

  /** Specs firing within the tick window [from, to). */
  def dueSpecs(specs: Seq[BackfillSpec], from: LocalDateTime,
               to: LocalDateTime): Seq[BackfillSpec] =
    specs.filter { s =>
      val n = s.cron.nextAfter(from.minusMinutes(1))
      !n.isBefore(from) && n.isBefore(to)
    }

  /** Fan one tick out to backfill-job rows: due specs x their integrations.
    * `integrations`: (integration_id, service_name). The splay is a
    * DETERMINISTIC per-integration offset (hash mod splay) — reproducible
    * and evenly spread, the distributed analog of the reference's random
    * in-process sleep (`async/scheduled_job.rb`). */
  def enqueueDue(spark: SparkSession, integrations: DataFrame,
                 specs: Seq[BackfillSpec], from: LocalDateTime,
                 to: LocalDateTime): DataFrame = {
    import spark.implicits._
    val due = dueSpecs(specs, from, to)
      .map(s => (s.serviceName, s.splaySeconds, s.incremental, s.recursive))
      .toDF("service_name", "splay_seconds", "incremental", "recursive")
    integrations.join(broadcast(due), Seq("service_name"))
      .select(
        col("integration_id"), col("service_name"),
        col("incremental"), col("recursive"),
        when(col("splay_seconds") > 0,
          pmod(xxhash64(col("integration_id")), col("splay_seconds")))
          .otherwise(lit(0)).cast("long").as("start_delay_seconds"))
  }
}

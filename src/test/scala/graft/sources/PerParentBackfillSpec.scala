package graft.sources

import graft.SparkSpec
import graft.operators.Pipeline
import graft.replicators.Replicators
import org.apache.spark.sql.functions._

/** S8+S12+I2+U4 end to end, modeled on the reference's episode-stats flow
  * (`transistor_episode_stats_v1.rb:81-134`): one backfiller per parent row,
  * incremental start = max(date) - 2 days per parent, pages land through the
  * parallel pool into the compound-key merge; re-running fetches only the
  * incremental window and stays idempotent. */
class PerParentBackfillSpec extends SparkSpec {
  import spark.implicits._

  private val spec = Replicators.transistorEpisodeStatsV1

  /** Fake per-episode stats API: date-keyed downloads, pages of 2 days. */
  private class StatsApi(episode: String, from: java.time.LocalDate,
                         until: java.time.LocalDate,
                         downloads: java.time.LocalDate => Int) extends Backfiller.PageFetcher {
    val fetched = scala.collection.mutable.ArrayBuffer.empty[java.time.LocalDate]
    def fetchPage(token: Option[String]) = {
      val start = token.map(java.time.LocalDate.parse).getOrElse(from)
      val days = Iterator.iterate(start)(_.plusDays(1))
        .takeWhile(!_.isAfter(until)).take(2).toSeq
      fetched ++= days
      val items = days.map { d =>
        val dmy = f"${d.getDayOfMonth}%02d-${d.getMonthValue}%02d-${d.getYear}"
        s"""{"episode_id":"$episode","date":"$dmy","downloads":${downloads(d)}}"""
      }
      val next = days.lastOption.map(_.plusDays(1)).filter(!_.isAfter(until))
      (items, next.map(_.toString))
    }
  }

  test("per-parent incremental backfill: watermarks bound refetch, merge dedups") {
    val d0 = java.time.LocalDate.parse("2024-01-01")
    val until1 = java.time.LocalDate.parse("2024-01-06")
    // first run: full history for two episodes
    val apis1 = Seq(
      new StatsApi("ep-1", d0, until1, _ => 10),
      new StatsApi("ep-2", d0, until1, _ => 20))
    val batch1 = Backfiller.runParallel(spark, apis1, parallelism = 2)
    val t1 = Pipeline.upsertBatch(spec, Pipeline.emptyTarget(spec, spark), batch1)
    assert(t1.count() == 12) // 6 days x 2 episodes

    // incremental run: start from max(date) - 2 days per episode
    val wm = Backfiller.perParentWatermarks(t1, "episode_id", "date", 2)
      .as[(String, java.sql.Date)].collect().toMap
    assert(wm("ep-1").toLocalDate == java.time.LocalDate.parse("2024-01-04"))

    val until2 = java.time.LocalDate.parse("2024-01-08")
    val apis2 = Seq(
      new StatsApi("ep-1", wm("ep-1").toLocalDate, until2, _ => 11), // revised counts
      new StatsApi("ep-2", wm("ep-2").toLocalDate, until2, _ => 20))
    val batch2 = Backfiller.runParallel(spark, apis2, parallelism = 2)
    val t2 = Pipeline.upsertBatch(spec, t1, batch2)

    assert(t2.count() == 16) // 8 days x 2 episodes, overlap merged not duplicated
    // only the incremental window was fetched (5 days per parent, not 8)
    assert(apis2.head.fetched.size == 5)
    // revised downloads overwrote the overlap (downloads-distinct update_where)
    val ep1 = t2.filter(col("episode_id") === "ep-1")
      .select("date", "downloads").as[(java.sql.Date, Long)].collect().toMap
    assert(ep1(java.sql.Date.valueOf("2024-01-05")) == 11L) // updated
    assert(ep1(java.sql.Date.valueOf("2024-01-02")) == 10L) // untouched history
  }
}

package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** K4 contract: rowupsert fan-out to subscriptions, attempt ledger, delivery
  * cap, and the retrying delivery executor (`webhook_subscription.rb:36-110`). */
class NotifySpec extends SparkSpec {
  import spark.implicits._

  private val changed = Seq(("r1", 10), ("r2", 20)).toDF("id", "v")
  private val subs = Seq(
    ("s1", "https://a.example/hook", true),
    ("s2", "https://b.example/hook", true),
    ("s3", "https://c.example/hook", false)) // inactive
    .toDF("subscription_id", "url", "active")

  test("enqueue fans changed rows out to active subscriptions only") {
    val q = Notify.enqueueDeliveries(changed, subs, "fake_v1")
    assert(q.count() == 4) // 2 rows x 2 active subs
    val row = q.collect()(0)
    assert(row.getAs[String]("table_name") == "fake_v1")
    assert(row.getAs[Int]("attempts") == 0)
    assert(q.filter(col("subscription_id") === "s3").count() == 0)
    // delivery ids are stamped and unique per (sub, payload)
    assert(q.select("delivery_id").distinct().count() == 4)
  }

  test("attempt recording joins on delivery_id: success stamps, failure counts") {
    val q = Notify.enqueueDeliveries(changed, subs, "fake_v1")
    val first = q.orderBy("delivery_id").select("delivery_id", "subscription_id")
      .as[(String, String)].collect()
    val okId = first.head._1
    val failId = first.last._1
    val results = Seq((okId, true), (failId, false)).toDF("delivery_id", "success")
    val after = Notify.recordAttempts(q, results)
    val ok = after.filter(col("delivery_id") === okId).collect()(0)
    assert(ok.getAs[java.sql.Timestamp]("delivered_at") != null)
    assert(ok.getAs[Int]("attempts") == 1)
    val failed = after.filter(col("delivery_id") === failId).collect()(0)
    assert(failed.getAs[java.sql.Timestamp]("delivered_at") == null)
    assert(failed.getAs[Int]("attempts") == 1)
    // pending excludes delivered and capped
    val pending = Notify.pendingDeliveries(after)
    assert(pending.filter(col("delivery_id") === okId).count() == 0)
    assert(pending.filter(col("delivery_id") === failId).count() == 1)
    val capped = after.withColumn("attempts", lit(Notify.MaxAttempts))
    assert(Notify.pendingDeliveries(capped).count() == 0)
  }

  test("delivery executor retries failing endpoints across waves") {
    // b.example flakes twice, then succeeds (attempt counts shared across
    // the single local JVM via the companion counter)
    NotifySpec.attempts.clear()
    val transport = new Notify.Transport {
      def post(url: String, payload: String): Boolean = {
        val n = NotifySpec.attempts.merge(url + "|" + payload, 1, _ + _)
        !url.contains("b.example") || n >= 3
      }
    }
    val q = Notify.enqueueDeliveries(changed, subs, "fake_v1")
    val ledger = Notify.deliverAll(q, transport, maxWaves = 5)
    // everything delivered; a-subs took 1 attempt, b-subs took 3
    assert(Notify.pendingDeliveries(ledger).isEmpty)
    val byUrl = ledger.select("url", "attempts").as[(String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byUrl("https://a.example/hook") == Set(1))
    assert(byUrl("https://b.example/hook") == Set(3))
    assert(ledger.filter(col("delivered_at").isNull).count() == 0)
  }

  test("delivery executor caps permanently failing endpoints") {
    val transport = new Notify.Transport {
      def post(url: String, payload: String): Boolean = !url.contains("b.example")
    }
    val q = Notify.enqueueDeliveries(changed, subs, "fake_v1")
    val ledger = Notify.deliverAll(q, transport, maxWaves = Notify.MaxAttempts)
    val b = ledger.filter(col("url").contains("b.example"))
    assert(b.filter(col("delivered_at").isNotNull).count() == 0)
    assert(b.select("attempts").as[Int].collect().toSet == Set(Notify.MaxAttempts))
    assert(Notify.pendingDeliveries(ledger).isEmpty) // capped, no longer pending
  }
}

object NotifySpec {
  /** Cross-task attempt counter (local-mode executors share this JVM). */
  val attempts = new java.util.concurrent.ConcurrentHashMap[String, Int]()
}

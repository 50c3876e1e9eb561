package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** K4 contract: rowupsert fan-out to subscriptions, attempt ledger, delivery
  * cap (`webhook_subscription.rb:36-110`). */
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
  }

  test("attempt recording: success stamps delivery, failure counts toward cap") {
    val q = Notify.enqueueDeliveries(changed, subs, "fake_v1")
    val firstPayload = q.select("payload").as[String].collect().head
    val results = Seq(
      ("s1", firstPayload, true),
      ("s2", firstPayload, false)).toDF("subscription_id", "payload", "success")
    val after = Notify.recordAttempts(q, results)
    val s1 = after.filter(col("subscription_id") === "s1" && col("payload") === firstPayload).collect()(0)
    assert(s1.getAs[java.sql.Timestamp]("delivered_at") != null)
    val s2 = after.filter(col("subscription_id") === "s2" && col("payload") === firstPayload).collect()(0)
    assert(s2.getAs[java.sql.Timestamp]("delivered_at") == null)
    assert(s2.getAs[Int]("attempts") == 1)
    // pending excludes delivered and capped
    val pending = Notify.pendingDeliveries(after)
    assert(pending.filter(col("subscription_id") === "s1" && col("payload") === firstPayload).count() == 0)
    val capped = after.withColumn("attempts", lit(Notify.MaxAttempts))
    assert(Notify.pendingDeliveries(capped).count() == 0)
  }
}

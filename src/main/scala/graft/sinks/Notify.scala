package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-row webhook notifications (K4, `base.rb:813-838`,
  * `webhook_subscription.rb:36-110`): changed rows (U7 side output of the
  * merge) fan out to one delivery per active subscription; deliveries retry
  * up to `MaxAttempts` with the attempt ledger kept as data.
  */
object Notify {

  val MaxAttempts = 25 // webhook_subscription.rb:36-38

  /** Build the delivery queue for one upsert batch: changed rows x active
    * subscriptions (broadcast — the subscription table is tiny). Payload is
    * the rowupsert envelope. */
  def enqueueDeliveries(changedRows: DataFrame, subscriptions: DataFrame,
                        tableName: String): DataFrame = {
    val subs = broadcast(subscriptions.filter(col("active"))
      .select(col("subscription_id"), col("url")))
    changedRows
      .withColumn("payload", to_json(struct(changedRows.columns.map(col): _*)))
      .select(col("payload"))
      .crossJoin(subs)
      .select(
        col("subscription_id"), col("url"),
        lit(tableName).as("table_name"),
        col("payload"),
        lit(0).as("attempts"),
        lit(null).cast("timestamp").as("delivered_at"))
  }

  /** Deliveries still eligible for an attempt. */
  def pendingDeliveries(deliveries: DataFrame): DataFrame =
    deliveries.filter(col("delivered_at").isNull && col("attempts") < MaxAttempts)

  /** Record an attempt wave: successes stamp delivered_at, failures count up.
    * `results`: (subscription_id, payload, success). */
  def recordAttempts(deliveries: DataFrame, results: DataFrame): DataFrame = {
    val r = results.select(col("subscription_id").as("r_sub"),
      col("payload").as("r_payload"), col("success"))
    deliveries.join(r,
        col("subscription_id") === col("r_sub") && col("payload") === col("r_payload"),
        "left")
      .withColumn("attempts",
        when(col("success").isNotNull, col("attempts") + 1).otherwise(col("attempts")))
      .withColumn("delivered_at",
        when(col("success") === true, current_timestamp()).otherwise(col("delivered_at")))
      .drop("r_sub", "r_payload", "success")
  }
}

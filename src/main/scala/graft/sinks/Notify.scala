package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-row webhook notifications (K4, `base.rb:813-838`,
  * `webhook_subscription.rb:36-110`): changed rows (U7 side output of the
  * merge) fan out to one delivery per active subscription; deliveries retry
  * up to `MaxAttempts` with the attempt ledger kept as data.
  *
  * Every delivery is stamped with a content-addressed `delivery_id` at
  * enqueue time; all later bookkeeping joins on that id — never on the
  * multi-KB payload string (which would shuffle payloads and break if a
  * transport re-serializes).
  */
object Notify {

  val MaxAttempts = 25 // webhook_subscription.rb:36-38

  /** The delivery transport (K3/K4 seam): POST one payload; return success.
    * Runs inside executor tasks — implementations must be serializable and
    * treat errors as `false`/throw (both count as a failed attempt). */
  trait Transport extends Serializable {
    def post(url: String, payload: String): Boolean
  }

  /** Build the delivery queue for one upsert batch: changed rows x active
    * subscriptions (broadcast — the subscription table is tiny). Payload is
    * the rowupsert envelope; `delivery_id` = md5(sub, table, payload) is the
    * idempotency key (re-enqueueing the same change is a no-op merge). */
  def enqueueDeliveries(changedRows: DataFrame, subscriptions: DataFrame,
                        tableName: String): DataFrame = {
    val subs = broadcast(subscriptions.filter(col("active"))
      .select(col("subscription_id"), col("url")))
    changedRows
      .withColumn("payload", to_json(struct(changedRows.columns.map(col): _*)))
      .select(col("payload"))
      .crossJoin(subs)
      .select(
        md5(concat_ws("|", col("subscription_id"), lit(tableName), col("payload")))
          .as("delivery_id"),
        col("subscription_id"), col("url"),
        lit(tableName).as("table_name"),
        col("payload"),
        lit(0).as("attempts"),
        lit(null).cast("timestamp").as("delivered_at"))
  }

  /** Deliveries still eligible for an attempt. */
  def pendingDeliveries(deliveries: DataFrame): DataFrame =
    deliveries.filter(col("delivered_at").isNull && col("attempts") < MaxAttempts)

  // Protocol WORK metric: POSTs actually executed, counted in a Spark
  // accumulator (cluster-safe; local-mode too). The delivery executor's
  // wall is driver-protocol-exposed (serial waves) like q72's, so the
  // bench emits this count next to the wall — a board move without a
  // matching attempt-count move is machine noise. At-least-once exact:
  // a retried task re-posts AND re-counts (the count tracks the posts).
  @transient private var attemptsAcc: org.apache.spark.util.LongAccumulator = _
  private def accFor(spark: org.apache.spark.sql.SparkSession) = synchronized {
    if (attemptsAcc == null)
      attemptsAcc = spark.sparkContext.longAccumulator("notify.post.attempts")
    attemptsAcc
  }

  /** Cumulative POSTs executed this JVM (read deltas around a measured
    * block; never reset — concurrent readers subtract). */
  def postAttempts: Long = synchronized {
    if (attemptsAcc == null) 0L else attemptsAcc.value
  }

  /** Record an attempt wave: successes stamp delivered_at, failures count up.
    * `results`: (delivery_id, success) — the id is the ONLY join key. */
  def recordAttempts(deliveries: DataFrame, results: DataFrame): DataFrame = {
    val r = results.select(col("delivery_id").as("r_id"), col("success"))
    deliveries.join(r, col("delivery_id") === col("r_id"), "left")
      .withColumn("attempts",
        when(col("success").isNotNull, col("attempts") + 1).otherwise(col("attempts")))
      .withColumn("delivered_at",
        when(col("success") === true, current_timestamp()).otherwise(col("delivered_at")))
      .drop("r_id", "success")
  }

  /** One delivery wave: post every pending delivery through `transport`
    * (distributed — posts run in executor tasks) and fold the outcomes back
    * into the ledger. */
  def attemptWave(deliveries: DataFrame, transport: Transport): DataFrame = {
    val spark = deliveries.sparkSession
    import spark.implicits._
    val acc = accFor(spark)
    val results = pendingDeliveries(deliveries)
      .select(col("delivery_id"), col("url"), col("payload"))
      .as[(String, String, String)]
      .map { case (id, url, payload) =>
        acc.add(1L)
        val ok = try transport.post(url, payload) catch { case _: Exception => false }
        (id, ok)
      }
      .toDF("delivery_id", "success")
      // Eagerly materialize: the map above POSTs. Without pinning the
      // results, every downstream action (or task retry) would re-run the
      // side-effecting map — duplicate HTTP deliveries with a real transport.
      .localCheckpoint(true)
    recordAttempts(deliveries, results)
  }

  /** The delivery executor (`webhook_subscription.rb:74-110`): run waves
    * until everything is delivered or capped, up to `maxWaves`. Backoff
    * between waves is the scheduler's job (the reference re-enqueues with
    * sidekiq delay) — callers insert sleeps between invocations if needed.
    * Each wave's ledger is checkpointed so the loop's plan stays flat. */
  def deliverAll(deliveries: DataFrame, transport: Transport,
                 maxWaves: Int = MaxAttempts): DataFrame = {
    var ledger = deliveries.localCheckpoint(true)
    var wave = 0
    while (wave < maxWaves && !pendingDeliveries(ledger).isEmpty) {
      ledger = attemptWave(ledger, transport).localCheckpoint(true)
      wave += 1
    }
    ledger
  }
}

package graft.queries

import graft.Tables
import graft.operators.{ColumnSpec, Pipeline, ReplicatorSpec}
import graft.sources.{Backfiller, DistributedBackfill}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The paginated-backfill protocol under the oracle gate (S2/S3/S4/I2/U4,
  * `backfiller.rb:13-114`): a deterministic cursor-paginated "API" is played
  * by the orders table held driver-side (the page protocol is inherently
  * serial — each token comes from the previous response), and the fetched
  * pages flow through the REAL path: Backfiller.run (with a transient
  * failure retried en route) -> webhook rows -> projection -> last-wins
  * dedup -> merge. The oracle recomputes the final table directly.
  *
  * Page protocol quirks exercised:
  *  - Stripe-style cursor tokens (`starting_after` = item count so far);
  *  - a transient 503 on page 2, succeeded on retry (`backfiller.rb:37-56`);
  *  - each page ends with a STALE "preview" of the next page's first order
  *    (amount bumped) that the next page re-delivers correctly — the
  *    in-batch last-wins dedup (U4) must keep the later, true row.
  */
object BackfillQueries {

  type Q = (SparkSession, String) => DataFrame

  private val spec = ReplicatorSpec(
    name = "order_backfill_v1",
    remoteKeyCol = "order_id",
    columns = Seq(
      ColumnSpec("order_id", LongType, Seq("id")),
      ColumnSpec("cust_id", LongType, Seq("cust")),
      ColumnSpec("status", StringType, Seq("status")),
      ColumnSpec("total", DoubleType, Seq("total"))))

  private val PageSize = 500

  def q72(spark: SparkSession, d: String): DataFrame = {
    // the "remote API": orders held driver-side, served in cursor pages
    val source = Tables.orders(spark, d)
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"),
        col("o_orderstatus"), col("o_totalprice").cast("double"))
      .orderBy(col("o_orderkey"))
      .collect()
    def item(i: Int, staleBump: Double): String = {
      val r = source(i)
      s"""{"id":${r.getLong(0)},"cust":${r.getLong(1)},""" +
        s""""status":"${r.getString(2)}","total":${r.getDouble(3) + staleBump}}"""
    }
    val flaked = new java.util.concurrent.atomic.AtomicBoolean(false)
    val fetcher = new Backfiller.PageFetcher {
      def fetchPage(token: Option[String]): (Seq[String], Option[String]) = {
        val start = token.map(_.toInt).getOrElse(0)
        if (start == PageSize && flaked.compareAndSet(false, true))
          throw new RuntimeException("transient 503") // retried, then succeeds
        val end = math.min(start + PageSize, source.length)
        val page = (start until end).map(item(_, 0.0)) ++
          // stale preview of the next page's first item (U4 fodder)
          (if (end < source.length) Seq(item(end, 999.0)) else Nil)
        (page, if (end < source.length) Some(end.toString) else None)
      }
    }
    val webhooks = Backfiller.run(spark, fetcher)
    Pipeline.upsertBatch(spec, Pipeline.emptyTarget(spec, spark), webhooks)
      .select(col("order_id"), col("cust_id"), col("status"), col("total"))
      .orderBy(col("order_id"))
  }

  private val q72Sql: String = """
    SELECT CAST(o_orderkey AS BIGINT) AS order_id,
      CAST(o_custkey AS BIGINT) AS cust_id,
      o_orderstatus AS status,
      CAST(o_totalprice AS DOUBLE) AS total
    FROM orders ORDER BY order_id"""

  /** S12 — the parallel backfill pool, executor-side: 8 independent
    * cursor-paginated shards (one fetcher per shard, like one backfiller per
    * parent row) read through the [[DistributedBackfill]] DataSourceV2 — each
    * shard is one InputPartition, the pagination loop runs inside its
    * executor task, and items never accumulate on the driver. Every remote
    * key is unique across shards, so the merged table is order-independent —
    * exactly why the reference can run backfillers concurrently against one
    * table. (The driver-collected `source` array below is the simulated
    * remote API the fetchers serve, not the operator's data path.) */
  def q88(spark: SparkSession, d: String): DataFrame = {
    val source = Tables.orders(spark, d)
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"),
        col("o_orderstatus"), col("o_totalprice").cast("double"))
      .orderBy(col("o_orderkey"))
      .collect()
    val shards = source.groupBy(r => (r.getLong(0) % 8).toInt)
    val fetchers = (0 until 8).map { sh =>
      val rows = shards.getOrElse(sh, Array.empty).map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      new DistributedBackfill.PageFetcher {
        def fetchPage(token: Option[String]): (Seq[String], Option[String]) = {
          val start = token.map(_.toInt).getOrElse(0)
          val end = math.min(start + 300, rows.length)
          val page = (start until end).map { i =>
            val (id, cust, status, total) = rows(i)
            s"""{"id":$id,"cust":$cust,"status":"$status","total":$total}"""
          }
          (page, if (end < rows.length) Some(end.toString) else None)
        }
      }
    }
    val webhooks = DistributedBackfill.read(spark, fetchers)
    Pipeline.upsertBatch(spec, Pipeline.emptyTarget(spec, spark), webhooks)
      .select(col("order_id"), col("cust_id"), col("status"), col("total"))
      .orderBy(col("order_id"))
  }

  private val q88Sql: String = """
    SELECT CAST(o_orderkey AS BIGINT) AS order_id,
      CAST(o_custkey AS BIGINT) AS cust_id,
      o_orderstatus AS status,
      CAST(o_totalprice AS DOUBLE) AS total
    FROM orders ORDER BY order_id"""

  /** S8 end-to-end, executor-side: per-parent incremental backfill. One
    * cursor per parent (user), resuming from that parent's watermark
    * (max(ts) - 2 days, `transistor_episode_stats_v1.rb:110-134`), all
    * cursors paginated INSIDE executor tasks via [[DistributedBackfill]] —
    * 150 parents at sf0.01 become 150 InputPartitions; at 100 TB, one per
    * episode, bounded by executor count, never by driver memory. The fetched
    * pages flow through the real projection -> dedup -> merge path. */
  def q89(spark: SparkSession, d: String): DataFrame = {
    val eventSpec = ReplicatorSpec(
      name = "event_backfill_v1",
      remoteKeyCol = "event_id",
      columns = Seq(
        ColumnSpec("event_id", LongType, Seq("id")),
        ColumnSpec("user_id", LongType, Seq("user")),
        ColumnSpec("ts_ms", LongType, Seq("ts_ms")),
        ColumnSpec("event_type", StringType, Seq("etype")),
        ColumnSpec("value", DoubleType, Seq("value"))))
    // the "remote API": per-user event streams (simulation harness only —
    // the operator path pulls pages on executors)
    val byUser = Tables.events(spark, d)
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        unix_millis(col("ts")).as("ts_ms"), col("event_type"),
        col("value").cast("double"))
      .collect()
      .map(r => (r.getLong(1), (r.getLong(0), r.getLong(2), r.getString(3), r.getDouble(4))))
      .groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._2).sortBy(_._1) }
    val fetchers = byUser.toSeq.sortBy(_._1).map { case (user, rows) =>
      val wm = rows.map(_._2).max - 2L * 86400000L // per-parent watermark
      val due = rows.filter(_._2 >= wm)
      new DistributedBackfill.PageFetcher {
        def fetchPage(token: Option[String]): (Seq[String], Option[String]) = {
          val start = token.map(_.toInt).getOrElse(0)
          val end = math.min(start + 25, due.length)
          val page = (start until end).map { i =>
            val (id, ts, etype, value) = due(i)
            s"""{"id":$id,"user":$user,"ts_ms":$ts,"etype":"$etype","value":$value}"""
          }
          (page, if (end < due.length) Some(end.toString) else None)
        }
      }
    }
    val webhooks = DistributedBackfill.read(spark, fetchers)
    Pipeline.upsertBatch(eventSpec, Pipeline.emptyTarget(eventSpec, spark), webhooks)
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  private val q89Sql: String = """
    SELECT e.event_id, e.user_id,
      epoch_ms(CAST(e.ts AS TIMESTAMP)) AS ts_ms,
      e.event_type, CAST(e.value AS DOUBLE) AS value
    FROM events e
    JOIN (SELECT user_id,
            max(epoch_ms(CAST(ts AS TIMESTAMP))) - 2*86400000 AS wm
          FROM events GROUP BY user_id) w
      ON e.user_id = w.user_id
    WHERE epoch_ms(CAST(e.ts AS TIMESTAMP)) >= w.wm
    ORDER BY e.event_id"""

  val defs: Map[String, Q] = Map(
    "q72_backfill_pagination" -> (q72 _),
    "q88_parallel_backfill" -> (q88 _),
    "q89_distributed_backfill" -> (q89 _))
  val oracles: Map[String, String] = Map(
    "q72_backfill_pagination" -> q72Sql,
    "q88_parallel_backfill" -> q88Sql,
    "q89_distributed_backfill" -> q89Sql)
}

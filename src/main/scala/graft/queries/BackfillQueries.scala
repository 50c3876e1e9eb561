package graft.queries

import graft.Tables
import graft.operators.{ColumnSpec, Pipeline, ReplicatorSpec}
import graft.sources.Backfiller
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

  /** S12 — the parallel backfill pool: 8 independent cursor-paginated
    * shards (one fetcher per shard, like one backfiller per parent row)
    * drained by a 4-thread pool. Shard completion order is nondeterministic,
    * but every remote key is unique across shards, so the merged table is
    * order-independent — exactly why the reference can run backfillers
    * concurrently against one table. */
  def q88(spark: SparkSession, d: String): DataFrame = {
    val source = Tables.orders(spark, d)
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"),
        col("o_orderstatus"), col("o_totalprice").cast("double"))
      .orderBy(col("o_orderkey"))
      .collect()
    val shards = source.groupBy(r => (r.getLong(0) % 8).toInt)
    val fetchers = (0 until 8).map { sh =>
      val rows = shards.getOrElse(sh, Array.empty)
      new Backfiller.PageFetcher {
        def fetchPage(token: Option[String]): (Seq[String], Option[String]) = {
          val start = token.map(_.toInt).getOrElse(0)
          val end = math.min(start + 300, rows.length)
          val page = (start until end).map { i =>
            val r = rows(i)
            s"""{"id":${r.getLong(0)},"cust":${r.getLong(1)},""" +
              s""""status":"${r.getString(2)}","total":${r.getDouble(3)}}"""
          }
          (page, if (end < rows.length) Some(end.toString) else None)
        }
      }
    }
    val webhooks = Backfiller.runParallel(spark, fetchers, parallelism = 4)
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

  val defs: Map[String, Q] = Map(
    "q72_backfill_pagination" -> (q72 _),
    "q88_parallel_backfill" -> (q88 _))
  val oracles: Map[String, String] = Map(
    "q72_backfill_pagination" -> q72Sql,
    "q88_parallel_backfill" -> q88Sql)
}

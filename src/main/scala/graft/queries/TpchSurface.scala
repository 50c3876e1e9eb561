package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The read-only SQL query surface the reference guarantees over replicated
  * tables (`lib/webhookdb/api/db.rb:150-156` delegates arbitrary SQL to
  * Postgres; here Catalyst provides the planner). Exercised as DataFrame
  * plans over the driver testdata, each with a DuckDB oracle.
  *
  * Numeric discipline for oracle parity: source doubles are cast to exact
  * decimals at the scan (2-decimal generated data round-trips exactly), and
  * all arithmetic stays in decimal — bit-identical across engines, no
  * float-summation-order hazards.
  */
object TpchSurface {

  private val dec2 = DecimalType(12, 2)
  private val dec3 = DecimalType(5, 3)

  type Q = (SparkSession, String) => DataFrame

  /** Pricing summary (TPC-H Q1 shape): scan-heavy agg; the filter and the
    * 6-column projection must push into the parquet scan. */
  def q01(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast(dec2).as("qty"),
        col("l_extendedprice").cast(dec2).as("price"),
        col("l_discount").cast(dec3).as("disc"),
        col("l_tax").cast(dec3).as("tax"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("qty")).cast("double").as("sum_qty"),
        sum(col("price")).cast("double").as("sum_base_price"),
        // per-row rounding to money scale BEFORE the sum: a scale-8 decimal
        // total overflows the 53-bit double mantissa at large SF, and the
        // engines' decimal->double casts then disagree by 1 ulp; scale-2
        // per-row values keep the cast exact on both sides. Spark's decimal
        // down-cast rounds HALF_UP, matching the oracle's explicit round()
        // (the oracle engine's CAST rounds half-down instead)
        sum((col("price") * (lit(1).cast(dec3) - col("disc"))).cast(DecimalType(18, 2)))
          .cast("double").as("sum_disc_price"),
        sum((col("price") * (lit(1).cast(dec3) - col("disc")) * (lit(1).cast(dec3) + col("tax")))
          .cast(DecimalType(18, 2))).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(sum(qty) AS DOUBLE) AS sum_qty,
      CAST(sum(price) AS DOUBLE) AS sum_base_price,
      CAST(sum(round(price * (CAST(1 AS DECIMAL(5,3)) - disc), 2)) AS DOUBLE) AS sum_disc_price,
      CAST(sum(round(price * (CAST(1 AS DECIMAL(5,3)) - disc) * (CAST(1 AS DECIMAL(5,3)) + tax), 2)) AS DOUBLE) AS sum_charge,
      count(*) AS count_order
    FROM (
      SELECT l_returnflag, l_linestatus,
        CAST(l_quantity AS DECIMAL(12,2)) AS qty,
        CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
        CAST(l_discount AS DECIMAL(5,3)) AS disc,
        CAST(l_tax AS DECIMAL(5,3)) AS tax
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** Revenue by nation (TPC-H Q5 shape): fact table joined to four dims.
    * Only nation/region carry broadcast hints — they are fixed-size (25/5
    * rows) at any SF. orders/customer scale with the fact table, so they are
    * left unhinted: AQE broadcasts them while they fit (small SF) and falls
    * back to shuffle joins at scale instead of OOMing the build side. */
  def q02(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast(dec2) * (lit(1).cast(dec3) - col("l_discount").cast(dec3)))
          .as("rev"))
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      .select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, d).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(spark, d).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val r = Tables.region(spark, d).select(col("r_regionkey"), col("r_name"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q02Sql: String = """
    SELECT r_name, n_name,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,3)) - CAST(l_discount AS DECIMAL(5,3)))) AS DOUBLE) AS revenue,
      count(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name"""

  /** Top-3 orders per market segment by order value (window top-k — the
    * rank is computed inside one shuffle on the segment key). */
  def q03(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice").cast(dec2).as("price"))
    val c = Tables.customer(spark, d).select(col("c_custkey"), col("c_mktsegment"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("price").desc, col("o_orderkey").asc)
    // customer scales with SF — no broadcast hint; AQE picks the strategy
    o.join(c, col("o_custkey") === col("c_custkey"))
      .withColumn("rank_in_segment", row_number().over(w))
      .filter(col("rank_in_segment") <= 3)
      .select(col("c_mktsegment"), col("rank_in_segment").cast("long").as("rank_in_segment"),
        col("o_orderkey"), col("price").cast("double").as("price"))
      .orderBy(col("c_mktsegment"), col("rank_in_segment"))
  }

  val q03Sql: String = """
    SELECT c_mktsegment, rank_in_segment, o_orderkey, CAST(price AS DOUBLE) AS price FROM (
      SELECT c_mktsegment, o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price,
        row_number() OVER (PARTITION BY c_mktsegment
          ORDER BY CAST(o_totalprice AS DECIMAL(12,2)) DESC, o_orderkey ASC) AS rank_in_segment
      FROM orders JOIN customer ON o_custkey = c_custkey)
    WHERE rank_in_segment <= 3
    ORDER BY c_mktsegment, rank_in_segment"""

  /** Order-priority check (TPC-H Q4 shape): EXISTS — a left-semi join. */
  def q04(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1996-10-01").cast(TimestampType))
    val late = Tables.lineitem(spark, d)
      .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
    o.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q04Sql: String = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Customers with no urgent orders (left anti join / NOT EXISTS). */
  def q05(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d)
    val o = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast(dec2)).cast("double").as("sum_acctbal"))
      .orderBy(col("c_mktsegment"))
  }

  val q05Sql: String = """
    SELECT c_mktsegment, count(*) AS n_customers,
      CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** ROLLUP aggregate (grouping-set surface; nulls coalesced to 'ALL' so
    * ordering/hashing is engine-neutral). */
  def q06(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        col("o_totalprice").cast(dec2).as("price"))
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price")).cast("double").as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_price"))
      .orderBy(col("status"), col("priority"))
  }

  val q06Sql: String = """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
      coalesce(o_orderpriority, 'ALL') AS priority,
      count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority"""

  /** Running/window aggregates over the event stream: per-user running value
    * sum and event index — one shuffle on user_id serves both windows. */
  def q07(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
      .filter(col("user_id") < 10)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value").cast(dec2).as("v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    e.withColumn("event_idx", row_number().over(w).cast("long"))
      .withColumn("running_value", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("event_idx"), col("running_value").cast("double").as("running_value"))
      .orderBy(col("user_id"), col("event_idx"))
  }

  val q07Sql: String = """
    SELECT event_id, user_id, event_type,
      row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS event_idx,
      CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
    FROM events WHERE user_id < 10
    ORDER BY user_id, event_idx"""

  val defs: Map[String, Q] = Map(
    "q01_pricing_summary" -> (q01 _),
    "q02_revenue_by_nation" -> (q02 _),
    "q03_topk_per_segment" -> (q03 _),
    "q04_order_priority_semijoin" -> (q04 _),
    "q05_customers_without_orders" -> (q05 _),
    "q06_rollup_orders" -> (q06 _),
    "q07_running_window" -> (q07 _))

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_revenue_by_nation" -> q02Sql,
    "q03_topk_per_segment" -> q03Sql,
    "q04_order_priority_semijoin" -> q04Sql,
    "q05_customers_without_orders" -> q05Sql,
    "q06_rollup_orders" -> q06Sql,
    "q07_running_window" -> q07Sql)
}

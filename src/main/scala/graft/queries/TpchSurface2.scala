package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second wave of SQL-surface coverage — the TPC-H join-topology
  * inventory beyond TpchSurface's Q1/Q4/Q5 basics: Q7/Q12/Q14/Q18/Q22
  * (conditional aggregation, IN-subqueries with HAVING, anti-join with a
  * scalar-subquery threshold, year-bucketed multi-join volumes), Q17/Q15
  * (correlated scalar aggregate, global-max scalar subquery), Q21 (the
  * exists + not-exists double correlation), and the round-8 additions
  * Q11/Q13/Q8/Q16/Q19 (global-share HAVING, zero-preserving custdist,
  * seven-table market share, NOT-IN blocklist under count-distinct,
  * disjunctive join residual). */
object TpchSurface2 {

  type Q = (SparkSession, String) => DataFrame
  private val dec2 = DecimalType(12, 2)
  private val dec3 = DecimalType(5, 3)

  /** Q7 shape: shipping volume between two nation pairs by year. */
  def q60(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey"),
      col("l_shipdate"),
      (col("l_extendedprice").cast(dec2) * (lit(1).cast(dec3) - col("l_discount").cast(dec3)))
        .as("volume"))
    val s = Tables.supplier(spark, d).select(col("s_suppkey"), col("s_nationkey"))
    val n1 = Tables.nation(spark, d).select(col("n_nationkey").as("sn_key"),
      col("n_name").as("supp_nation"))
    val o = Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, d).select(col("c_custkey"), col("c_nationkey"))
    val n2 = Tables.nation(spark, d).select(col("n_nationkey").as("cn_key"),
      col("n_name").as("cust_nation"))
    // only the fixed-size nation dims are hinted; supplier/orders/customer
    // scale with SF — AQE broadcasts them while small, SMJ at scale
    li.join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") < col("cust_nation")) // unordered pair, kept once
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(col("volume")).cast("double").as("revenue"), count(lit(1)).as("n"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q60Sql: String = """
    SELECT supp_nation, cust_nation, l_year,
      CAST(sum(volume) AS DOUBLE) AS revenue, count(*) AS n
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(year(l_shipdate) AS BIGINT) AS l_year,
        CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,3)) - CAST(l_discount AS DECIMAL(5,3))) AS volume
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name < n2.n_name)
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year"""

  /** Q12 shape: late-shipment priority classification (conditional sums). */
  def q61(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
    val o = Tables.orders(spark, d).select(col("o_orderkey"), col("o_orderpriority"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  val q61Sql: String = """
    SELECT l_linestatus,
      CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus ORDER BY l_linestatus"""

  /** Q14 shape: promo revenue share (ratio of conditional decimal sums,
    * emitted as numerator/denominator to stay division-free and exact). */
  def q62(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1997-03-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-04-01").cast(TimestampType))
      .select(col("l_partkey"),
        (col("l_extendedprice").cast(dec2) * (lit(1).cast(dec3) - col("l_discount").cast(dec3)))
          .as("rev"))
    // part scales with SF (200k rows/SF) — unhinted, AQE decides
    val p = Tables.part(spark, d).select(col("p_partkey"), col("p_type"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type").startsWith("PROMO"), col("rev"))
          .otherwise(lit(0).cast(dec2))).cast("double").as("promo_revenue"),
        sum(col("rev")).cast("double").as("total_revenue"),
        count(lit(1)).as("n_items"))
  }

  val q62Sql: String = """
    SELECT
      CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_revenue,
      CAST(sum(rev) AS DOUBLE) AS total_revenue,
      count(*) AS n_items
    FROM (
      SELECT l_partkey,
        CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,3)) - CAST(l_discount AS DECIMAL(5,3))) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00')
    JOIN part ON l_partkey = p_partkey"""

  /** Q18 shape: large-volume orders (IN-subquery over a HAVING group). */
  def q63(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
    val bigOrders = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(dec2)).as("total_qty"))
      .filter(col("total_qty") > 150)
    val o = Tables.orders(spark, d)
    o.join(bigOrders, col("o_orderkey") === bigOrders("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast(dec2).cast("double").as("total_price"),
        col("total_qty").cast("double").as("total_qty"))
      .orderBy(col("o_orderkey"))
  }

  val q63Sql: String = """
    SELECT o_orderkey, o_custkey,
      CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price,
      CAST(total_qty AS DOUBLE) AS total_qty
    FROM orders JOIN (
      SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150
    ) big ON o_orderkey = big.l_orderkey
    ORDER BY o_orderkey"""

  /** Q22 shape: well-funded "inactive" customers — acctbal above the global
    * positive average (scalar subquery) with no completed ('F') orders
    * (anti-join on a filtered subquery). */
  def q64(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal").cast(dec2).as("bal"))
    val avgBal = c.filter(col("bal") > 0)
      .agg((sum(col("bal")) / count(lit(1))).as("avg_bal"))
    val o = Tables.orders(spark, d)
      .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("bal") > col("avg_bal"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), sum(col("bal")).cast("double").as("sum_bal"))
      .orderBy(col("c_mktsegment"))
  }

  val q64Sql: String = """
    SELECT c_mktsegment, count(*) AS n_customers,
      CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
    FROM customer
    WHERE CAST(c_acctbal AS DECIMAL(12,2)) > (
        SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) / count(*)
        FROM customer WHERE CAST(c_acctbal AS DECIMAL(12,2)) > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** Set-operation surface: customers with urgent orders INTERSECT those
    * with finished orders; EXCEPT those with any 5-LOW order. */
  def q65(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
    def custsWhere(c: org.apache.spark.sql.Column) =
      o.filter(c).select(col("o_custkey")).distinct()
    custsWhere(col("o_orderpriority") === "1-URGENT")
      .intersect(custsWhere(col("o_orderstatus") === "F"))
      .except(custsWhere(col("o_orderpriority") === "5-LOW"))
      .orderBy(col("o_custkey"))
  }

  val q65Sql: String = """
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    ORDER BY o_custkey"""

  /** Range-predicate join: per order, line items shipped within 30 days of
    * the order date — an equi key plus an inequality band (the range-join
    * shape; Spark plans equi-hash + residual filter). */
  def q66(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1997-02-01").cast(TimestampType))
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_shipdate"))
    o.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= date_add(col("o_orderdate"), 30))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_fast_lines"))
      .orderBy(col("o_orderkey"))
  }

  val q66Sql: String = """
    SELECT o_orderkey, count(*) AS n_fast_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      AND l_shipdate >= o_orderdate
      AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-02-01 00:00:00'
    GROUP BY o_orderkey ORDER BY o_orderkey"""

  /** q126 — TPC-H Q17 shape: small-quantity-order revenue. The classic
    * CORRELATED SCALAR AGGREGATE (l_quantity < 0.2 * avg(l_quantity) per
    * part) — here written the way Catalyst executes it after subquery
    * decorrelation: a part-keyed pre-aggregate joined back on the key.
    * The fractional threshold is replaced by the exact integer
    * cross-multiply (5 * ql * cnt < sum_ql, quantities are integral), so
    * no double division enters the predicate; revenue sums in decimal.
    *
    * Scale shape: the per-part aggregate is part-cardinality-sized (and
    * map-side combined); the join back is on the aggregation key, so the
    * exchange introduced by the agg satisfies the join's distribution —
    * the decorrelated plan every engine wants for Q17. */
  def q126(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d).select(col("l_partkey"),
      col("l_quantity").cast("long").as("ql"),
      col("l_extendedprice").cast(dec2).as("price"))
    val stats = li.groupBy(col("l_partkey"))
      .agg(sum(col("ql")).as("sum_ql"), count(lit(1)).as("cnt"))
    li.join(stats, Seq("l_partkey"))
      .filter(col("ql") * 5L * col("cnt") < col("sum_ql"))
      .agg((sum(col("price")).cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_qualifying"))
  }

  val q126Sql: String = """
    SELECT CAST(sum(price) AS DOUBLE) / 7.0 AS avg_yearly,
      count(*) AS n_qualifying
    FROM (
      SELECT l_partkey, CAST(l_quantity AS BIGINT) AS ql,
        CAST(l_extendedprice AS DECIMAL(12,2)) AS price
      FROM lineitem) li
    JOIN (
      SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_ql,
        CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey) st
    USING (l_partkey)
    WHERE ql * 5 * cnt < sum_ql"""

  /** q127 — TPC-H Q15 shape: top revenue supplier(s). A quarter's
    * per-supplier revenue (decimal-exact sums) compared against the
    * GLOBAL MAX — the scalar-subquery-over-aggregate pattern (the
    * reference's saved-view revenue0). Exact decimal revenue makes the
    * max comparison engine-stable; ties would all surface (none in this
    * data, deterministically either way).
    *
    * Scale shape: supplier-keyed agg (map-side combined), one scalar max
    * broadcast back — no window over the corpus, no second scan of
    * lineitem. */
  def q127(spark: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-04-01").cast(TimestampType))
      .select(col("l_suppkey"),
        (col("l_extendedprice").cast(dec2) *
          (lit(1).cast(dec3) - col("l_discount").cast(dec3))).as("r"))
      .groupBy(col("l_suppkey")).agg(sum(col("r")).as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("max_rev"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_rev") === col("max_rev"))
      .join(Tables.supplier(spark, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q127Sql: String = """
    WITH rev AS (
      SELECT l_suppkey, sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
          (CAST(1 AS DECIMAL(5,3)) - CAST(l_discount AS DECIMAL(5,3)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    ORDER BY s_suppkey"""

  /** q136 — TPC-H Q21 shape (waiting supplier): the hardest join topology
    * in the benchmark — a candidate row must pass BOTH an EXISTS (another
    * supplier in the same order) and a NOT EXISTS (no OTHER supplier was
    * also late) against the same fact table. Expressed as the decorrelated
    * plan Catalyst targets for existence subqueries: one per-order
    * aggregate (distinct suppliers / distinct LATE suppliers) joined back
    * on the aggregation key — exists-other <=> n_supp >= 2, and (given the
    * candidate itself is late) no-other-late <=> n_late = 1. "Late" means
    * shipped more than 60 days after the order date (this schema carries
    * no commit/receipt dates). The oracle runs the LITERAL correlated
    * EXISTS/NOT EXISTS form — two independent formulations, one result.
    *
    * Scale shape: the per-order aggregate's exchange (orderkey) satisfies
    * the join-back's distribution requirement — one shuffle feeds both
    * sides (the q126 discipline); supplier is a broadcast dim; the final
    * per-supplier count is dim-sized. */
  def q136(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val late = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
        (datediff(col("l_shipdate"), col("o_orderdate")) > 60).as("late"))
    val perOrder = late.groupBy(col("ok")).agg(
      countDistinct(col("sk")).as("n_supp"),
      countDistinct(when(col("late"), col("sk"))).as("n_late"))
    val waiting = late.filter(col("late"))
      .select(col("ok"), col("sk")).distinct()
      .join(perOrder, Seq("ok"))
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
    val s = Tables.supplier(spark, d).select(col("s_suppkey"), col("s_name"))
    waiting.join(broadcast(s), col("sk") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  val q136Sql: String = """
    WITH L AS (
      SELECT l_orderkey AS ok, l_suppkey AS sk,
        (date_diff('day', o_orderdate, l_shipdate) > 60) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'),
    W AS (
      SELECT DISTINCT ok, sk FROM L l1 WHERE late
        AND EXISTS (SELECT 1 FROM L l2 WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
        AND NOT EXISTS (SELECT 1 FROM L l3
                        WHERE l3.ok = l1.ok AND l3.sk <> l1.sk AND l3.late))
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM W JOIN supplier ON s_suppkey = sk
    GROUP BY s_name ORDER BY numwait DESC, s_name"""

  /** q145 — TPC-H Q11 shape (important stock): groups whose aggregate
    * exceeds a FRACTION OF THE GLOBAL TOTAL — the scalar-subquery-in-
    * HAVING topology (Q11 runs it over partsupp; this testdata ships no
    * partsupp, so the same shape runs over lineitem revenue per part:
    * parts carrying more than 1.5x the MEAN per-part revenue share —
    * the mean-relative form keeps the predicate meaningful at every
    * scale factor, where Q11's absolute fraction must be rescaled by
    * hand). All arithmetic is
    * integer millicents (price_cents * (1000 - disc_milli)) so the share
    * predicate and the ppm output are bit-exact cross-engine with no
    * decimal-scale or double-summation hazards; sums stay < 2^63 up to
    * ~10^8 lineitems per partition-free total (re-scale to cents at
    * larger corpora).
    *
    * Scale shape: one part-keyed map-side-combinable aggregate; the
    * global total is a scalar broadcast back into the HAVING filter — no
    * second fact scan, no window. The having-over-global pattern costs
    * one 1-row exchange beyond plain group-by. */
  def q145(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d).select(col("l_partkey"),
      (col("l_extendedprice").cast(dec2) * 100).cast("long") .as("pc"),
      (col("l_discount").cast(dec3) * 1000).cast("long").as("dm"))
      .select(col("l_partkey"), (col("pc") * (lit(1000L) - col("dm"))).as("rev"))
    val byPart = li.groupBy(col("l_partkey")).agg(sum(col("rev")).as("part_rev"))
    val total = byPart.agg(sum(col("part_rev")).as("total_rev"),
      count(lit(1)).as("n_parts"))
    byPart.crossJoin(broadcast(total))
      .filter(col("part_rev") * col("n_parts") * 2L > col("total_rev") * 3L)
      .select(col("l_partkey"), col("part_rev"),
        expr("CASE WHEN total_rev > 0 THEN (part_rev * 1000000) DIV total_rev ELSE 0 END")
          .as("share_ppm"))
      .orderBy(col("share_ppm").desc, col("l_partkey"))
  }

  val q145Sql: String = """
    WITH li AS (
      SELECT l_partkey,
        CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) *
          (1000 - CAST(CAST(l_discount AS DECIMAL(5,3)) * 1000 AS BIGINT)) AS rev
      FROM lineitem),
    bp AS (SELECT l_partkey, CAST(sum(rev) AS BIGINT) AS part_rev FROM li GROUP BY 1),
    t AS (SELECT CAST(sum(part_rev) AS BIGINT) AS total_rev,
          CAST(count(*) AS BIGINT) AS n_parts FROM bp)
    SELECT l_partkey, part_rev,
      (CASE WHEN total_rev > 0
        THEN (part_rev * 1000000) // total_rev ELSE 0 END) AS share_ppm
    FROM bp, t
    WHERE part_rev * n_parts * 2 > total_rev * 3
    ORDER BY share_ppm DESC, l_partkey"""

  /** q146 — TPC-H Q13 shape (customer distribution): LEFT join customers
    * to their qualifying orders, count per customer INCLUDING the
    * zero-order customers, then histogram the counts — the two-level
    * group-by whose first level must preserve empty groups (an inner
    * join would silently drop the c_count = 0 bucket, the most important
    * row of the report).
    *
    * Scale shape: the orders side pre-aggregates to (custkey, count)
    * BEFORE the join — the join input is per-customer, not per-order —
    * then a left join from customers and a count-keyed histogram
    * aggregate. Both aggregates map-side combine; the join key is the
    * first aggregate's distribution. */
  def q146(spark: SparkSession, d: String): DataFrame = {
    val perCust = Tables.orders(spark, d)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("c_count"))
    Tables.customer(spark, d).select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q146Sql: String = """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(coalesce(pc.c_count, 0) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS c_count
        FROM orders WHERE o_orderpriority <> '1-URGENT'
        GROUP BY o_custkey) pc
      ON c_custkey = pc.o_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC"""

  /** q151 — TPC-H Q8 shape (national market share): the widest join
    * topology on the board — lineitem to part (type filter), supplier to
    * its nation (the share's numerator flag), orders to customer to
    * nation to region (the market scope filter), grouped by order year
    * with a CONDITIONAL share aggregate. All revenue in integer
    * millicents (q145's discipline) so numerator, denominator, and the
    * ppm share are bit-exact — no decimal division anywhere.
    *
    * Scale shape: nation/region broadcast always; part and supplier are
    * hinted broadcast at test scale (both SF-scaled — AQE would pick the
    * same here; at warehouse scale they degrade to shuffle joins on the
    * fact table's own keys); orders/customer join on their keys. ONE
    * pass over the fact table, one 3-row aggregate out. */
  def q151(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        ((col("l_extendedprice").cast(dec2) * 100).cast("long") *
          (lit(1000L) - (col("l_discount").cast(dec3) * 1000).cast("long"))).as("vol"))
    val p = Tables.part(spark, d).filter(col("p_type") === "MEDIUM")
      .select(col("p_partkey"))
    val s = Tables.supplier(spark, d).select(col("s_suppkey"), col("s_nationkey"))
    val sn = Tables.nation(spark, d)
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1999-01-01").cast(TimestampType))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    val c = Tables.customer(spark, d).select(col("c_custkey"), col("c_nationkey"))
    val cn = Tables.nation(spark, d)
      .select(col("n_nationkey").as("cnk"), col("n_regionkey"))
    val r = Tables.region(spark, d).filter(col("r_name") === "EUROPE")
      .select(col("r_regionkey"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("snk"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(cn), col("c_nationkey") === col("cnk"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("o_year"))
      .agg(sum(col("vol")).as("total_vol"),
        sum(when(col("supp_nation") === "NATION_1", col("vol")).otherwise(0L))
          .as("nation_vol"))
      .withColumn("share_ppm",
        expr("CASE WHEN total_vol > 0 THEN (nation_vol * 1000000) DIV total_vol ELSE 0 END"))
      .orderBy(col("o_year"))
  }

  val q151Sql: String = """
    SELECT o_year,
      CAST(sum(vol) AS BIGINT) AS total_vol,
      CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN vol ELSE 0 END) AS BIGINT) AS nation_vol,
      (CASE WHEN CAST(sum(vol) AS BIGINT) > 0
        THEN (CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN vol ELSE 0 END) AS BIGINT) * 1000000)
          // CAST(sum(vol) AS BIGINT) ELSE 0 END) AS share_ppm
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, n1.n_name AS supp_nation,
        CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) *
          (1000 - CAST(CAST(l_discount AS DECIMAL(5,3)) * 1000 AS BIGINT)) AS vol
      FROM lineitem
      JOIN part ON l_partkey = p_partkey AND p_type = 'MEDIUM'
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'EUROPE'
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY o_year ORDER BY o_year"""

  /** q152 — TPC-H Q16 shape (supplier diversity): per (p_brand, p_size)
    * bucket, the DISTINCT supplier count over non-MEDIUM parts, EXCLUDING
    * a blocklist computed by subquery (suppliers with more than twice
    * the MEAN returned-line count — the "customer complaints" stand-in
    * this schema supports, mean-relative so the predicate bites at every
    * scale factor). The two plan features this adds to the board's join
    * inventory: a NOT-IN anti join feeding an aggregation, and
    * count(DISTINCT) under GROUP BY (the RewriteDistinctAggregates
    * Expand path).
    *
    * Scale shape: the blocklist is supplier-cardinality-sized (an
    * aggregate with HAVING) and anti-joins the fact rows before the
    * distinct aggregate — at test scale it broadcasts, at warehouse
    * scale it degrades to a key-distributed anti join; the distinct agg
    * shuffles (brand, size, suppkey) partials map-side. */
  def q152(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .select(col("l_partkey"), col("l_suppkey"), col("l_returnflag"))
    val rcounts = li.filter(col("l_returnflag") === "R")
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("rc"))
    val stats = rcounts.agg(sum(col("rc")).as("total_rc"),
      count(lit(1)).as("n_supp"))
    val blocked = rcounts.crossJoin(broadcast(stats))
      .filter(col("rc") * col("n_supp") > col("total_rc") * 2L)
      .select(col("l_suppkey").as("bad_supp"))
    val p = Tables.part(spark, d).filter(col("p_type") =!= "MEDIUM")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .join(blocked, col("l_suppkey") === col("bad_supp"), "left_anti")
      .groupBy(col("p_brand"), col("p_size").cast(LongType).as("p_size"))
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  val q152Sql: String = """
    SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
      CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_type <> 'MEDIUM'
    WHERE l_suppkey NOT IN (
      WITH rc AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS rc
                  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
           st AS (SELECT CAST(sum(rc) AS BIGINT) AS total_rc,
                  CAST(count(*) AS BIGINT) AS n_supp FROM rc)
      SELECT l_suppkey FROM rc, st WHERE rc * n_supp > total_rc * 2)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size"""

  /** q153 — TPC-H Q19 shape (discounted revenue, disjunctive predicate):
    * the join whose residual condition is an OR of three
    * brand/size/quantity conjunction branches — the optimizer stress Q19
    * exists for: the common `p_partkey = l_partkey` conjunct must still
    * drive a key join (not a nested-loop filter), with the disjunction
    * evaluated as a post-join residual, and each branch's part-side
    * conjuncts still push into the part scan as an OR filter. Revenue in
    * integer millicents (q145's discipline), plus the qualifying line
    * count so the gate pins membership, not just the sum.
    *
    * Scale shape: one fact pass, part broadcast at test scale (key join +
    * residual under any strategy at warehouse scale), 1-row output. */
  def q153(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d).select(col("l_partkey"),
      col("l_quantity").cast("long").as("qty"),
      ((col("l_extendedprice").cast(dec2) * 100).cast("long") *
        (lit(1000L) - (col("l_discount").cast(dec3) * 1000).cast("long"))).as("rev"))
    val p = Tables.part(spark, d)
      .select(col("p_partkey"), col("p_brand"), col("p_size").cast("long").as("psz"))
    val branch1 = col("p_brand") === "Brand#1" &&
      col("psz").between(1L, 10L) && col("qty").between(1L, 20L)
    val branch2 = col("p_brand") === "Brand#2" &&
      col("psz").between(5L, 25L) && col("qty").between(10L, 35L)
    val branch3 = col("p_brand") === "Brand#3" &&
      col("psz").between(10L, 40L) && col("qty").between(20L, 50L)
    li.join(p, col("l_partkey") === col("p_partkey") &&
        (branch1 || branch2 || branch3))
      .agg(sum(col("rev")).as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy(col("n_lines"))
  }

  val q153Sql: String = """
    SELECT CAST(sum(rev) AS BIGINT) AS revenue,
      CAST(count(*) AS BIGINT) AS n_lines
    FROM (
      SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) *
          (1000 - CAST(CAST(l_discount AS DECIMAL(5,3)) * 1000 AS BIGINT)) AS rev
      FROM lineitem) li
    JOIN (SELECT p_partkey, p_brand, CAST(p_size AS BIGINT) AS psz FROM part) p
    ON l_partkey = p_partkey AND (
      (p_brand = 'Brand#1' AND psz BETWEEN 1 AND 10 AND qty BETWEEN 1 AND 20) OR
      (p_brand = 'Brand#2' AND psz BETWEEN 5 AND 25 AND qty BETWEEN 10 AND 35) OR
      (p_brand = 'Brand#3' AND psz BETWEEN 10 AND 40 AND qty BETWEEN 20 AND 50))
    ORDER BY n_lines"""

  val defs: Map[String, Q] = Map(
    "q153_disjunctive_revenue" -> (q153 _),
    "q152_supplier_diversity" -> (q152 _),
    "q151_market_share" -> (q151 _),
    "q146_custdist" -> (q146 _),
    "q145_important_parts" -> (q145 _),
    "q136_waiting_supplier" -> (q136 _),
    "q126_small_qty_revenue" -> (q126 _),
    "q127_top_supplier" -> (q127 _),
    "q60_volume_by_nation_pair" -> (q60 _),
    "q61_priority_classification" -> (q61 _),
    "q62_promo_revenue" -> (q62 _),
    "q63_large_orders" -> (q63 _),
    "q64_rich_inactive_customers" -> (q64 _),
    "q65_set_operations" -> (q65 _),
    "q66_range_join" -> (q66 _))

  val oracles: Map[String, String] = Map(
    "q153_disjunctive_revenue" -> q153Sql,
    "q152_supplier_diversity" -> q152Sql,
    "q151_market_share" -> q151Sql,
    "q146_custdist" -> q146Sql,
    "q145_important_parts" -> q145Sql,
    "q136_waiting_supplier" -> q136Sql,
    "q126_small_qty_revenue" -> q126Sql,
    "q127_top_supplier" -> q127Sql,
    "q60_volume_by_nation_pair" -> q60Sql,
    "q61_priority_classification" -> q61Sql,
    "q62_promo_revenue" -> q62Sql,
    "q63_large_orders" -> q63Sql,
    "q64_rich_inactive_customers" -> q64Sql,
    "q65_set_operations" -> q65Sql,
    "q66_range_join" -> q66Sql)
}

package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fourth wave of SQL-surface coverage — the five TPC-H topologies the
  * inventory still lacked: Q7 (two-role nation join, volume shipping),
  * Q12 (fact-fact join with CASE-sum priority split), Q14 (conditional
  * aggregate ratio), Q18 (aggregate-HAVING feeding a join-back) and
  * Q22 (scalar-aggregate comparison + anti-join). With TpchSurface /
  * TpchSurface2 / TpchSurface3 this completes all 22 TPC-H query
  * shapes. Schema adaptations (this testdata has no l_shipmode /
  * l_receiptdate / c_phone / partsupp): Q12's mode axis becomes
  * l_linestatus and "late" becomes shipped >90 days after ordering;
  * Q22's country code becomes the nation key (codeset = nationkey%5 in
  * {1,3}) and "no orders" becomes "no orders since 1999" (every
  * customer has SOME order in this data). The JOIN SHAPES — which is
  * what the coverage is about — are unchanged, and all money stays in
  * the integer cents x permille discipline of q145/q151.
  *
  * Reference anchor: lib/webhookdb/customer.rb saved-query endpoints —
  * the reference exposes arbitrary SQL over synced tables; these are
  * the canonical warehouse topologies that surface must plan well.
  */
object TpchSurface4 {

  type Q = (SparkSession, String) => DataFrame
  private val dec2 = DecimalType(12, 2)
  private val dec3 = DecimalType(5, 3)

  /** Integer cents / permille projections shared by the wave. */
  private def li(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d).select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_shipdate"), col("l_linestatus"),
      (col("l_extendedprice").cast(dec2) * 100).cast(LongType).as("pc"),
      (col("l_discount").cast(dec3) * 1000).cast(LongType).as("dm"),
      col("l_quantity").cast(LongType).as("ql"))

  /** q169 — TPC-H Q7 shape (volume shipping): revenue flowing between
    * nation pairs, the one topology where the SAME dimension joins in
    * TWO ROLES (supplier's nation via lineitem, customer's nation via
    * orders). Both role filters (nationkey < 4, supp != cust) push into
    * the dim scans BEFORE the fact joins, so the fact tables shrink at
    * the earliest join; nation-name lookups broadcast. Grouped by
    * (supp_nation, cust_nation, ship year) — at most 12 pairs x years. */
  def q169(spark: SparkSession, d: String): DataFrame = {
    val s = Tables.supplier(spark, d).filter(col("s_nationkey") < 4)
      .select(col("s_suppkey"), col("s_nationkey"))
    val c = Tables.customer(spark, d).filter(col("c_nationkey") < 4)
      .select(col("c_custkey"), col("c_nationkey"))
    val o = Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
    val n = Tables.nation(spark, d).select(col("n_nationkey"), col("n_name"))
    li(spark, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .join(broadcast(n.as("sn")), col("s_nationkey") === col("sn.n_nationkey"))
      .join(broadcast(n.as("cn")), col("c_nationkey") === col("cn.n_nationkey"))
      .select(col("sn.n_name").as("supp_nation"),
        col("cn.n_name").as("cust_nation"),
        year(col("l_shipdate")).cast(LongType).as("l_year"),
        (col("pc") * (lit(1000L) - col("dm"))).as("rev"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("rev")).as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q169Sql: String = """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      CAST(year(l_shipdate) AS BIGINT) AS l_year,
      CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) *
        (1000 - CAST(CAST(l_discount AS DECIMAL(5,3)) * 1000 AS BIGINT))) AS BIGINT) AS revenue,
      count(*) AS n_lines
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE s_nationkey < 4 AND c_nationkey < 4
      AND s_nationkey <> c_nationkey
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year"""

  /** q170 — TPC-H Q12 shape (late shipments by mode): a fact-fact join
    * whose aggregate is a pair of CASE-sums over a low-cardinality axis.
    * Adapted: the mode axis is l_linestatus and "late" = shipped more
    * than 90 days after the order date (interval arithmetic both engines
    * evaluate identically on timestamps). The priority split is Q12's
    * exact CASE pair; everything is map-side combinable after the join. */
  def q170(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    li(spark, d)
      .select(col("l_orderkey"), col("l_linestatus"), col("l_shipdate"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  val q170Sql: String = """
    SELECT l_linestatus,
      CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_linestatus
    ORDER BY l_linestatus"""

  /** q171 — TPC-H Q14 shape (promo revenue share): the conditional-
    * aggregate ratio. One month of lineitem joins the part dim; the
    * answer is promo revenue as a share of total. The ratio stays
    * integer (permille via DIV, guarded like q148/q155) so the oracle is
    * bit-exact; both component sums ship alongside it. */
  def q171(spark: SparkSession, d: String): DataFrame = {
    val p = Tables.part(spark, d).select(col("p_partkey"), col("p_type"))
    li(spark, d)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-10-01").cast(TimestampType))
      .join(p, col("l_partkey") === col("p_partkey"))
      .select((col("pc") * (lit(1000L) - col("dm"))).as("rev"), col("p_type"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev")).otherwise(0L))
          .as("promo_rev"),
        sum(col("rev")).as("total_rev"))
      .withColumn("promo_pm",
        expr("CASE WHEN total_rev > 0 THEN (promo_rev * 1000) DIV total_rev END"))
  }

  val q171Sql: String = """
    SELECT promo_rev, total_rev,
      CASE WHEN total_rev > 0 THEN (promo_rev * 1000) // total_rev END AS promo_pm
    FROM (
      SELECT
        CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT) AS promo_rev,
        CAST(sum(rev) AS BIGINT) AS total_rev
      FROM (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) *
          (1000 - CAST(CAST(l_discount AS DECIMAL(5,3)) * 1000 AS BIGINT)) AS rev,
          p_type
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'))"""

  /** q172 — TPC-H Q18 shape (large-volume customers): an aggregate with
    * a HAVING threshold whose survivors join BACK to the fact's parents.
    * The per-order quantity sum runs first (map-side combinable, keyed by
    * the fact's own key so AQE sees the shrink), the >260 filter keeps
    * ~1% of orders, and only those few rows touch the orders/customer
    * dims. Top 100 by order value plans as TakeOrderedAndProject. */
  def q172(spark: SparkSession, d: String): DataFrame = {
    val big = li(spark, d).groupBy(col("l_orderkey"))
      .agg(sum(col("ql")).as("sum_qty"))
      .filter(col("sum_qty") > 260L)
    val o = Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
      (col("o_totalprice").cast(dec2) * 100).cast(LongType).as("total_cents"))
    val c = Tables.customer(spark, d).select(col("c_custkey"), col("c_name"))
    big.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"), col("od"),
        col("total_cents"), col("sum_qty"))
      .orderBy(col("total_cents").desc, col("o_orderkey"))
      .limit(100)
  }

  val q172Sql: String = """
    SELECT c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od,
      CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS total_cents,
      sum_qty
    FROM (
      SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 260)
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY total_cents DESC, o_orderkey
    LIMIT 100"""

  /** q173 — TPC-H Q22 shape (dormant wealthy customers): a scalar
    * aggregate compared per-row plus an anti-join. Adapted: country code
    * = nation key (codeset nationkey%5 in {1,3}) and dormancy = no order
    * since 1999 (every customer here has SOME order). The above-average
    * test is cross-multiplied (acct_cents x n > total_cents) so it stays
    * integer-exact — no division, no 1-ulp avg surface. The scalar
    * (n, total) broadcast-cross-joins every candidate; the recent-order
    * probe is a LEFT ANTI join. */
  def q173(spark: SparkSession, d: String): DataFrame = {
    val code = Tables.customer(spark, d)
      .filter(col("c_nationkey") % 5 === 1 || col("c_nationkey") % 5 === 3)
      .select(col("c_custkey"), col("c_nationkey"),
        (col("c_acctbal").cast(dec2) * 100).cast(LongType).as("acct_cents"))
    val stat = code.filter(col("acct_cents") > 0)
      .agg(count(lit(1)).as("n_pos"), sum(col("acct_cents")).as("tot_pos"))
    val recent = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast(TimestampType))
      .select(col("o_custkey"))
    code.crossJoin(broadcast(stat))
      .filter(col("acct_cents") * col("n_pos") > col("tot_pos"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), sum(col("acct_cents")).as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  val q173Sql: String = """
    WITH code AS (
      SELECT c_custkey, c_nationkey,
        CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS acct_cents
      FROM customer WHERE c_nationkey % 5 IN (1, 3)),
    stat AS (
      SELECT count(*) AS n_pos, CAST(sum(acct_cents) AS BIGINT) AS tot_pos
      FROM code WHERE acct_cents > 0)
    SELECT c_nationkey AS cntrycode, count(*) AS numcust,
      CAST(sum(acct_cents) AS BIGINT) AS totacctbal
    FROM code, stat
    WHERE acct_cents * n_pos > tot_pos
      AND c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY cntrycode
    ORDER BY cntrycode"""

  val defs: Map[String, Q] = Map(
    "q169_volume_shipping" -> (q169 _),
    "q170_late_shipments" -> (q170 _),
    "q171_promo_share" -> (q171 _),
    "q172_bigqty_customers" -> (q172 _),
    "q173_dormant_wealthy" -> (q173 _))

  val oracles: Map[String, String] = Map(
    "q169_volume_shipping" -> q169Sql,
    "q170_late_shipments" -> q170Sql,
    "q171_promo_share" -> q171Sql,
    "q172_bigqty_customers" -> q172Sql,
    "q173_dormant_wealthy" -> q173Sql)
}

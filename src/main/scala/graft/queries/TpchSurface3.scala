package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third wave of SQL-surface coverage — the remaining TPC-H join
  * topologies: Q3 (top-k over a three-table join aggregate), Q6 (the
  * pure scan-pushdown revenue probe), Q10 (returned-item customer
  * ranking), Q9 (profit decomposition across five tables), Q20 (nested
  * two-level aggregate feeding a semi-join), Q2 (argmin-per-group
  * supplier selection under a region filter). Q2/Q9/Q20 are adapted to
  * this testdata's schema (no partsupp table: unit costs come from
  * lineitem offers and part retail price), keeping each query's JOIN
  * SHAPE — which is what the coverage is about — while staying
  * integer-exact for the oracle (cents x permille arithmetic, the
  * q145/q151 discipline).
  *
  * Reference anchor: the reference's query surface is arbitrary
  * SQL-over-synced-tables (lib/webhookdb/customer.rb query endpoints /
  * saved queries); these shapes are the standard inventory a warehouse
  * engine must plan well.
  */
object TpchSurface3 {

  type Q = (SparkSession, String) => DataFrame
  private val dec2 = DecimalType(12, 2)
  private val dec3 = DecimalType(5, 3)

  /** Integer cents / permille projections shared by the wave. */
  private def li(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d).select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_shipdate"), col("l_returnflag"),
      (col("l_extendedprice").cast(dec2) * 100).cast(LongType).as("pc"),
      (col("l_discount").cast(dec3) * 1000).cast(LongType).as("dm"),
      col("l_quantity").cast(LongType).as("ql"))

  /** q159 — TPC-H Q3 shape (shipping priority): the unshipped-orders
    * top-k. Three-table join (segment-filtered customer, date-bounded
    * orders and lineitem), revenue aggregate per order, global top 10 —
    * which Spark plans as TakeOrderedAndProject (per-partition heaps, no
    * full sort). Revenue in integer cents x permille. */
  def q159(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") < lit("1998-06-01").cast(TimestampType))
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
        col("o_orderpriority"))
    val l = li(spark, d)
      .filter(col("l_shipdate") > lit("1998-06-01").cast(TimestampType))
      .select(col("l_orderkey"), (col("pc") * (lit(1000L) - col("dm"))).as("rev"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("od"), col("o_orderpriority"))
      .agg(sum(col("rev")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q159Sql: String = """
    SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od, o_orderpriority,
      CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) *
        (1000 - CAST(CAST(l_discount AS DECIMAL(5,3)) * 1000 AS BIGINT))) AS BIGINT) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, od, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10"""

  /** q160 — TPC-H Q6 shape (forecast revenue change): the pure
    * filter-and-aggregate scan probe. The date and quantity predicates
    * push into the parquet scan (PushedFilters); the discount-band
    * predicate evaluates on the exact permille projection (a derived
    * column — post-scan by construction). One output row; revenue =
    * sum(extendedprice x discount) in cents x permille. */
  def q160(spark: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1998-01-01").cast(TimestampType) &&
        col("l_quantity") < 25)
      .select(
        (col("l_extendedprice").cast(dec2) * 100).cast(LongType).as("pc"),
        (col("l_discount").cast(dec3) * 1000).cast(LongType).as("dm"))
      .filter(col("dm") >= 20 && col("dm") <= 40)
    l.agg(sum(col("pc") * col("dm")).as("revenue"),
      count(lit(1)).as("n_lines"))
  }

  val q160Sql: String = """
    SELECT CAST(sum(pc * dm) AS BIGINT) AS revenue, count(*) AS n_lines
    FROM (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS pc,
        CAST(CAST(l_discount AS DECIMAL(5,3)) * 1000 AS BIGINT) AS dm
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_quantity < 25)
    WHERE dm BETWEEN 20 AND 40"""

  /** q161 — TPC-H Q10 shape (returned-item reporting): which customers
    * returned the most revenue in a quarter. Quarter-bounded orders join
    * return-flagged lineitems and the customer + nation dims; top 20 by
    * returned revenue (TakeOrderedAndProject again — the ranking never
    * materializes a global sort). Account balance in exact cents. */
  def q161(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1998-04-01").cast(TimestampType))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = li(spark, d).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), (col("pc") * (lit(1000L) - col("dm"))).as("rev"))
    val c = Tables.customer(spark, d).select(col("c_custkey"), col("c_name"),
      col("c_nationkey"),
      (col("c_acctbal").cast(dec2) * 100).cast(LongType).as("acct_cents"))
    val n = Tables.nation(spark, d)
      .select(col("n_nationkey"), col("n_name"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"), col("acct_cents"))
      .agg(sum(col("rev")).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q161Sql: String = """
    SELECT c_custkey, c_name, n_name,
      CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS acct_cents,
      CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) *
        (1000 - CAST(CAST(l_discount AS DECIMAL(5,3)) * 1000 AS BIGINT))) AS BIGINT) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1998-01-01'
      AND o_orderdate < TIMESTAMP '1998-04-01'
    GROUP BY c_custkey, c_name, n_name, acct_cents
    ORDER BY revenue DESC, c_custkey
    LIMIT 20"""

  /** q162 — TPC-H Q9 shape (product-type profit): profit decomposed by
    * supplier nation and order year over five tables. No partsupp table
    * here, so unit cost is adapted to 90% of the part's retail price —
    * the JOIN TOPOLOGY (fact to part filter, supplier-to-nation dim
    * chain, orders for the year axis) is the coverage target. Profit =
    * revenue(cents x permille) - cost_cents x 900 x qty, all integer. */
  def q162(spark: SparkSession, d: String): DataFrame = {
    val p = Tables.part(spark, d)
      .filter(col("p_name").contains("widget"))
      .select(col("p_partkey"),
        (col("p_retailprice").cast(dec2) * 100).cast(LongType).as("rc"))
    val s = Tables.supplier(spark, d).select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(spark, d).select(col("n_nationkey"), col("n_name"))
    val o = Tables.orders(spark, d).select(col("o_orderkey"),
      year(col("o_orderdate")).cast(LongType).as("o_year"))
    li(spark, d)
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name"), col("o_year"),
        (col("pc") * (lit(1000L) - col("dm")) - col("rc") * 900L * col("ql"))
          .as("amount"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(col("amount")).as("profit"), count(lit(1)).as("n_lines"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  val q162Sql: String = """
    SELECT n_name, o_year, CAST(sum(amount) AS BIGINT) AS profit,
      count(*) AS n_lines
    FROM (
      SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) *
          (1000 - CAST(CAST(l_discount AS DECIMAL(5,3)) * 1000 AS BIGINT)) -
          CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) * 900 *
          CAST(l_quantity AS BIGINT) AS amount
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      WHERE p_name LIKE '%widget%')
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year DESC"""

  /** q163 — TPC-H Q20 shape (potential part promotion): suppliers who
    * dominate a part family's shipped volume. Adapted from availqty
    * (partsupp is absent) to shipped share: a supplier qualifies if it
    * shipped the majority (>50%) of some red part's 1997 volume. The shape —
    * a two-level aggregate (per supplier x part, then per part) feeding
    * a DISTINCT semi-join into the supplier dim — is Q20's nested
    * subquery chain made explicit. */
  def q163(spark: SparkSession, d: String): DataFrame = {
    val p = Tables.part(spark, d).filter(col("p_name").startsWith("red"))
      .select(col("p_partkey"))
    val shipped = li(spark, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
      .join(p, col("l_partkey") === col("p_partkey"))
      .select(col("l_suppkey"), col("l_partkey"), col("ql"))
    val perSuppPart = shipped.groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("ql")).as("sq"))
    val perPart = perSuppPart.groupBy(col("l_partkey"))
      .agg(sum(col("sq")).as("tq"))
    val dominating = perSuppPart.join(perPart, Seq("l_partkey"))
      .filter(col("sq") * 2L > col("tq"))
      .select(col("l_suppkey")).distinct()
    val s = Tables.supplier(spark, d).select(col("s_suppkey"), col("s_name"),
      col("s_nationkey"))
    val n = Tables.nation(spark, d).select(col("n_nationkey"), col("n_name"))
    s.join(dominating, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_suppkey"))
  }

  val q163Sql: String = """
    WITH shipped AS (
      SELECT l_suppkey, l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2),
    per_part AS (
      SELECT l_partkey, CAST(sum(sq) AS BIGINT) AS tq FROM shipped GROUP BY 1),
    dominating AS (
      SELECT DISTINCT l_suppkey
      FROM shipped JOIN per_part USING (l_partkey)
      WHERE sq * 2 > tq)
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM dominating)
    ORDER BY s_suppkey"""

  /** q164 — TPC-H Q2 shape (minimum-cost supplier): for every small part,
    * the EUROPE supplier offering the lowest unit price. No partsupp, so
    * the offer book is the lineitem history (unit price = cents x 1000
    * DIV quantity — integer floor, both engines agree); the correlated
    * MIN subquery becomes an argmin struct per part (min (unit, suppkey)
    * — the exact expression form of the correlated lookup, one pass, no
    * window), then the winner joins the supplier/nation dims. */
  def q164(spark: SparkSession, d: String): DataFrame = {
    val p = Tables.part(spark, d).filter(col("p_size") <= 3)
      .select(col("p_partkey"), col("p_name"))
    val s = Tables.supplier(spark, d).select(col("s_suppkey"), col("s_name"),
      col("s_nationkey"))
    val n = Tables.nation(spark, d).select(col("n_nationkey"), col("n_regionkey"))
    val r = Tables.region(spark, d).filter(col("r_name") === "EUROPE")
      .select(col("r_regionkey"))
    val euroSupp = s
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"))
    val offers = li(spark, d)
      .join(euroSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .join(p.select(col("p_partkey")), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .select(col("l_partkey"),
        expr("(pc * 1000) DIV ql").as("unit"),
        col("l_suppkey"))
    val best = offers.groupBy(col("l_partkey"))
      .agg(min(struct(col("unit"), col("l_suppkey"))).as("b"))
      .select(col("l_partkey"),
        col("b").getField("unit").as("best_unit_milli"),
        col("b").getField("l_suppkey").as("s_suppkey"))
    best
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(euroSupp, Seq("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("best_unit_milli"),
        col("s_suppkey"), col("s_name"))
      .orderBy(col("p_partkey"))
  }

  val q164Sql: String = """
    WITH euro_supp AS (
      SELECT s_suppkey, s_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    small_part AS (
      SELECT p_partkey, p_name FROM part WHERE p_size <= 3),
    offers AS (
      SELECT l_partkey,
        (CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) * 1000)
          // CAST(l_quantity AS BIGINT) AS unit,
        l_suppkey
      FROM lineitem
      WHERE l_suppkey IN (SELECT s_suppkey FROM euro_supp)
        AND l_partkey IN (SELECT p_partkey FROM small_part)),
    best AS (
      SELECT l_partkey,
        (min({'u': unit, 's': l_suppkey})).u AS best_unit_milli,
        (min({'u': unit, 's': l_suppkey})).s AS s_suppkey
      FROM offers GROUP BY l_partkey)
    SELECT p_partkey, p_name, best_unit_milli, s_suppkey, s_name
    FROM best
    JOIN small_part ON l_partkey = p_partkey
    JOIN euro_supp USING (s_suppkey)
    ORDER BY p_partkey"""

  val defs: Map[String, Q] = Map(
    "q159_shipping_priority" -> (q159 _),
    "q160_forecast_revenue" -> (q160 _),
    "q161_returned_items" -> (q161 _),
    "q162_nation_profit" -> (q162 _),
    "q163_part_promotion" -> (q163 _),
    "q164_mincost_supplier" -> (q164 _))

  val oracles: Map[String, String] = Map(
    "q159_shipping_priority" -> q159Sql,
    "q160_forecast_revenue" -> q160Sql,
    "q161_returned_items" -> q161Sql,
    "q162_nation_profit" -> q162Sql,
    "q163_part_promotion" -> q163Sql,
    "q164_mincost_supplier" -> q164Sql)
}

package graft.plans

import graft.{SparkSpec, Tables}
import graft.plans.ColumnLineage.SourceColumn
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column lineage must follow values through every computing operator and
  * stop at the right physical relations — the audit is only trustworthy
  * if aliases, aggregates, windows, generators, grouping sets, unions,
  * joins, and subquery expressions all resolve. */
class ColumnLineageSpec extends SparkSpec {

  private def li = Tables.lineitem(spark, sfDir)
  private def ord = Tables.orders(spark, sfDir)

  private def src(cols: String*): Set[SourceColumn] =
    cols.map { c => val Array(t, n) = c.split("\\."); SourceColumn(t, n) }.toSet

  test("projection and aggregate expressions resolve through aliases") {
    val q = li.select(col("l_returnflag"),
        (col("l_quantity") * col("l_extendedprice")).as("gross"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("gross")).as("revenue"), count(lit(1)).as("n"))
    val l = ColumnLineage.lineage(q)
    assert(l("l_returnflag") == src("lineitem.l_returnflag"))
    assert(l("revenue") == src("lineitem.l_quantity", "lineitem.l_extendedprice"))
    assert(l("n") == Set.empty, "count(1) derives from no source column")
  }

  test("joins attribute each output to its own side; filters add nothing") {
    val q = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderstatus") === "F")
      .select(col("l_partkey"), col("o_totalprice"),
        (col("l_tax") + col("o_totalprice")).as("mix"))
    val l = ColumnLineage.lineage(q)
    assert(l("l_partkey") == src("lineitem.l_partkey"))
    assert(l("o_totalprice") == src("orders.o_totalprice"))
    assert(l("mix") == src("lineitem.l_tax", "orders.o_totalprice"))
  }

  test("windows, generators, and unions carry their inputs") {
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
    val win = li.select(col("l_orderkey"),
      sum(col("l_quantity")).over(w).as("running"))
    assert(ColumnLineage.lineage(win)("running") ==
      src("lineitem.l_quantity", "lineitem.l_orderkey", "lineitem.l_linenumber"))

    val gen = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    assert(ColumnLineage.lineage(gen)("tok") == src("documents.text"))

    val un = li.select(col("l_partkey").as("k"), col("l_quantity").as("v"))
      .unionByName(ord.select(col("o_orderkey").as("k"), col("o_totalprice").as("v")))
    val lu = ColumnLineage.lineage(un)
    assert(lu("k") == src("lineitem.l_partkey", "orders.o_orderkey"))
    assert(lu("v") == src("lineitem.l_quantity", "orders.o_totalprice"))
  }

  test("grouping sets (Expand) and scalar subqueries resolve") {
    val cube = li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("q"))
    val lc = ColumnLineage.lineage(cube)
    assert(lc("q") == src("lineitem.l_quantity"))
    assert(lc("l_returnflag") == src("lineitem.l_returnflag"))

    li.createOrReplaceTempView("cl_li")
    ord.createOrReplaceTempView("cl_ord")
    val sub = spark.sql(
      """SELECT l_partkey,
           l_quantity + (SELECT max(o_totalprice) FROM cl_ord) AS boosted
         FROM cl_li""")
    val ls = ColumnLineage.lineage(sub)
    assert(ls("boosted") == src("lineitem.l_quantity", "orders.o_totalprice"))
  }

  test("WITH clauses resolve through CTE definitions to the physical table") {
    li.createOrReplaceTempView("cl_li2")
    ord.createOrReplaceTempView("cl_ord2")
    // single reference
    val one = spark.sql(
      """WITH t AS (SELECT l_partkey AS pk, l_quantity * 2 AS q2 FROM cl_li2)
         SELECT pk, q2 FROM t WHERE q2 > 0""")
    val l1 = ColumnLineage.lineage(one)
    assert(l1("pk") == src("lineitem.l_partkey"))
    assert(l1("q2") == src("lineitem.l_quantity"))
    // the same CTE referenced TWICE (fresh output exprIds per reference)
    // plus a second CTE built on the first
    val two = spark.sql(
      """WITH t AS (SELECT l_orderkey AS k, l_tax AS x FROM cl_li2),
            u AS (SELECT k, x * 3 AS x3 FROM t)
         SELECT a.k AS k, a.x + b.x AS xx, u.x3 AS x3
         FROM t a JOIN t b ON a.k = b.k JOIN u ON u.k = a.k""")
    val l2 = ColumnLineage.lineage(two)
    assert(l2("k") == src("lineitem.l_orderkey"))
    assert(l2("xx") == src("lineitem.l_tax"))
    assert(l2("x3") == src("lineitem.l_tax"))
  }

  test("render is a stable audit line per column") {
    val q = li.select((col("l_tax") * 2).as("t2"))
    assert(ColumnLineage.render(q) == "t2 <- lineitem.l_tax")
  }
}

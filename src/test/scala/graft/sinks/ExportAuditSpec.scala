package graft.sinks

import graft.SparkSpec
import graft.plans.SavedQueries
import org.apache.spark.sql.functions._

/** "Which exports ship values derived from column X" must be ONE call
  * across every registered outbound surface — including derived values
  * (hashes, concats) a grant-level audit cannot see — and must resolve
  * saved queries at AUDIT time, not registration time. */
class ExportAuditSpec extends SparkSpec {

  // isolated session: temp views and saved queries are session-global and
  // suites run in parallel on the shared session
  private lazy val s = spark.newSession()
  private lazy val saved = new SavedQueries(s)
  private lazy val audit = {
    Seq("customer", "orders", "nation").foreach { t =>
      s.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(s"ea_$t")
    }
    val a = new ExportAudit(s, Some(saved))
    // db sync target: ships a HASH of the customer name — the derived-PII
    // case a column-grant audit misses
    a.register("crm-db-sync", "db",
      s.read.parquet(s"$sfDir/customer.parquet")
        .select(col("c_custkey"), md5(col("c_name")).as("name_hash"),
          col("c_acctbal")))
    // http page sink: raw SQL join deriving revenue from o_totalprice
    a.registerSql("partner-http-feed", "http",
      """SELECT c.c_mktsegment AS segment, sum(o.o_totalprice) AS revenue
         FROM ea_orders o JOIN ea_customer c ON o.o_custkey = c.c_custkey
         GROUP BY c.c_mktsegment""")
    // warehouse export backed by a saved query
    saved.save("sq-nations", "SELECT n_name, n_regionkey FROM ea_nation")
    a.registerSavedQuery("warehouse-nations", "warehouse", "sq-nations")
    a
  }

  test("derived values are traced to their source column across exports") {
    val touches = audit.exportsTouching("customer", "c_name")
    assert(touches.map(_.targetId) == Seq("crm-db-sync"))
    assert(touches.head.kind == "db")
    assert(touches.head.columns == Seq("name_hash"),
      "the hash column must be traced back to c_name")
  }

  test("sql-registered exports participate: aggregate over a join") {
    val touches = audit.exportsTouching("orders", "o_totalprice")
    assert(touches.map(_.targetId) == Seq("partner-http-feed"))
    assert(touches.head.columns == Seq("revenue"))
    // the join KEY is a control dependency, not a value one
    assert(audit.exportsTouching("orders", "o_custkey").isEmpty)
  }

  test("an unexported column reports clean") {
    assert(audit.exportsTouching("customer", "c_nationkey").isEmpty)
    assert(audit.renderTouching("customer", "c_nationkey")
      .startsWith("no export ships values"))
  }

  test("saved-query exports resolve at audit time: re-saving re-points") {
    assert(audit.exportsTouching("nation", "n_name")
      .map(_.targetId) == Seq("warehouse-nations"))
    saved.save("sq-nations", "SELECT n_regionkey FROM ea_nation")
    assert(audit.exportsTouching("nation", "n_name").isEmpty,
      "audit must see the re-saved query, not a registration-day snapshot")
    assert(audit.exportsTouching("nation", "n_regionkey")
      .map(_.targetId) == Seq("warehouse-nations"))
    saved.save("sq-nations", "SELECT n_name, n_regionkey FROM ea_nation")
  }

  test("a column feeding several exports lists all of them, sorted") {
    val a2 = new ExportAudit(s)
    val cust = s.read.parquet(s"$sfDir/customer.parquet")
    a2.register("t2", "http", cust.select(col("c_name")))
    a2.register("t1", "db",
      cust.select(concat(col("c_name"), lit("!")).as("greeting")))
    assert(a2.exportsTouching("customer", "c_name").map(_.targetId) ==
      Seq("t1", "t2"))
    assert(a2.renderTouching("customer", "c_name") ==
      "t1 (db): greeting\nt2 (http): c_name")
    a2.unregister("t1")
    assert(a2.exportsTouching("customer", "c_name").map(_.targetId) == Seq("t2"))
  }

  test("registerSavedQuery without a store fails loudly") {
    val bare = new ExportAudit(s)
    intercept[IllegalStateException](
      bare.registerSavedQuery("x", "db", "sq-nations"))
  }
}

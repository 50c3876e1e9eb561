package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.types._

class FdwExportSpec extends SparkSpec {

  private val t = FdwExport.TableExport("stripe_charge_v1",
    StructType(Seq(
      StructField("stripe_id", StringType),
      StructField("amount", LongType),
      StructField("updated", TimestampType))),
    "/data/org1/stripe_charge_v1")

  test("table DDL mounts the parquet location with the full schema") {
    val ddl = FdwExport.createTableDdl(t)
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS stripe_charge_v1"))
    assert(ddl.contains("stripe_id STRING"))
    assert(ddl.contains("amount BIGINT"))
    assert(ddl.contains("USING parquet LOCATION '/data/org1/stripe_charge_v1'"))
    // generated DDL parses as valid Spark SQL
    spark.sessionState.sqlParser.parsePlan(ddl)
  }

  test("export script includes schema, tables, views; identifiers validated") {
    val script = FdwExport.exportScript(Seq(t), "org1_views")
    assert(script.contains("CREATE SCHEMA IF NOT EXISTS org1_views"))
    assert(script.contains("CREATE OR REPLACE VIEW org1_views.stripe_charge_v1"))
    assertThrows[IllegalArgumentException](
      FdwExport.createTableDdl(t.copy(name = "bad name;drop")))
  }

  // ---- the postgres_fdw payload, generated AND executed --------------------

  private def payloadFor(suffix: String, integrations: Seq[FdwExport.Integration]) =
    FdwExport.fdwPayload(
      remoteServerName = s"whdb_server_$suffix", fetchSize = 50000,
      localSchema = s"local_$suffix", viewSchema = s"views_$suffix",
      conn = FdwExport.RemoteConn("db.example.com", 5432, s"org_$suffix", "ro_user", "sekrit"),
      orgSchema = s"remote_$suffix", integrations = integrations)

  test("fdw payload matches the reference statement forms") {
    val p = payloadFor("g", Seq(
      FdwExport.Integration("svi_b", "stripe_charge_v1", "stripe_charge_v1_0001"),
      FdwExport.Integration("svi_a", "github_issue_v1", "github_issue_v1_0002")))
    assert(p.fdwSql.startsWith("CREATE EXTENSION IF NOT EXISTS postgres_fdw;\n"))
    assert(p.fdwSql.contains("DROP SERVER IF EXISTS whdb_server_g CASCADE;"))
    assert(p.fdwSql.contains(
      "CREATE SERVER whdb_server_g\n  FOREIGN DATA WRAPPER postgres_fdw\n" +
        "  OPTIONS (host 'db.example.com', port '5432', dbname 'org_g', fetch_size '50000');"))
    assert(p.fdwSql.contains(
      "CREATE USER MAPPING FOR CURRENT_USER\n  SERVER whdb_server_g\n" +
        "  OPTIONS (user 'ro_user', password 'sekrit');"))
    assert(p.fdwSql.contains(
      "IMPORT FOREIGN SCHEMA remote_g\n  FROM SERVER whdb_server_g\n  INTO local_g;"))
    // views keyed by opaque id; views_sql sorted by statement text
    assert(p.views.keySet == Set("svi_a", "svi_b"))
    assert(p.viewsSql.linesIterator.toSeq == p.views.values.toSeq.sorted)
    assert(p.compoundSql == p.fdwSql + "\n" + p.viewsSql)
    // blank/injection args are refused, like the reference's blank? guard
    assertThrows[IllegalArgumentException](payloadFor("bad ident", Nil))
    assertThrows[IllegalArgumentException](FdwExport.fdwPayload(
      "s", 1, "l", "v", FdwExport.RemoteConn("h", 1, "d", "u", "p'; DROP--"), "r", Nil))
  }

  test("the payload EXECUTES: matviews serve the remote org's rows") {
    val sfx = s"t${System.nanoTime() % 1000000}"
    val remote = s"remote_$sfx"
    spark.sql(s"CREATE DATABASE $remote")
    try {
      Tables.region(spark, sfDir).write.saveAsTable(s"$remote.region_rows")
      Tables.nation(spark, sfDir).write.saveAsTable(s"$remote.nation_rows")
      val p = payloadFor(sfx, Seq(
        FdwExport.Integration("svi_x", "region_v1", "region_rows"),
        FdwExport.Integration("svi_y", "nation_v1", "nation_rows")))
      val fdw = new FdwEmbedded(spark)
      fdw.executeScript(p.compoundSql)
      // mount effects: the matviews serve the remote rows
      assert(spark.table(s"views_$sfx.region_v1").count() == 5)
      assert(spark.table(s"views_$sfx.nation_v1").count() == 25)
      assert(spark.table(s"views_$sfx.nation_v1").columns.sameElements(
        Tables.nation(spark, sfDir).columns))
      // IF NOT EXISTS semantics: re-running the whole payload is idempotent
      fdw.executeScript(p.compoundSql)
      assert(spark.table(s"views_$sfx.region_v1").count() == 5)
      // the matview is a MATERIALIZATION: new remote rows appear only after
      // refresh, exactly like REFRESH MATERIALIZED VIEW
      spark.table(s"$remote.region_rows").limit(1)
        .write.mode("append").saveAsTable(s"$remote.region_rows")
      assert(spark.table(s"views_$sfx.region_v1").count() == 5)
      fdw.refreshMatView(s"views_$sfx", "region_v1", s"local_$sfx", "region_rows")
      assert(spark.table(s"views_$sfx.region_v1").count() == 6)
      // drift detector: statements outside the payload protocol are rejected
      assertThrows[IllegalArgumentException](fdw.execute("DROP TABLE x.y"))
      // DROP SERVER CASCADE unmounts the imported foreign tables
      fdw.execute(s"DROP SERVER IF EXISTS whdb_server_$sfx CASCADE")
      assert(fdw.serverNames.isEmpty)
      assert(!spark.catalog.tableExists(s"local_$sfx.region_rows"))
    } finally {
      Seq(remote, s"local_$sfx", s"views_$sfx").foreach(db =>
        spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE"))
    }
  }

  test("import without a user mapping fails, as postgres_fdw would") {
    val sfx = s"u${System.nanoTime() % 1000000}"
    spark.sql(s"CREATE DATABASE remote_$sfx")
    try {
      val p = payloadFor(sfx, Nil)
      val fdw = new FdwEmbedded(spark)
      // replay the payload but drop the USER MAPPING statement
      val stmts = p.fdwSql.split(";").map(_.trim).filter(_.nonEmpty)
        .filterNot(_.startsWith("CREATE USER MAPPING"))
      val err = intercept[IllegalArgumentException] {
        stmts.foreach(fdw.execute)
      }
      assert(err.getMessage.contains("no user mapping"))
    } finally {
      Seq(s"remote_$sfx", s"local_$sfx", s"views_$sfx").foreach(db =>
        spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE"))
    }
  }
}

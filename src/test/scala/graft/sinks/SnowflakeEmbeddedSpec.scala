package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.sql.DriverManager

/** K2 executed LIVE: every statement [[SnowflakeExport]] generates is run
  * through [[SnowflakeEmbedded]] against embedded Derby, and the assertions
  * are row effects — the same treatment K1 gets via [[JdbcPageSink.Derby]].
  * Matches the flow of `db_adapter/snowflake.rb:81-146` +
  * `sync_target.rb:415-672`: ensure schema, then per page stage -> PUT ->
  * MERGE -> drop stage. */
class SnowflakeEmbeddedSpec extends AnyFunSuite {

  private val st = StructType(Seq(
    StructField("pk", LongType),
    StructField("name", StringType),
    StructField("data", MapType(StringType, StringType)),
    StructField("at", TimestampType)))

  private def withDb(f: (java.sql.Connection, SnowflakeEmbedded) => Unit): Unit = {
    val url = s"jdbc:derby:memory:snow${System.nanoTime()};create=true"
    val conn = DriverManager.getConnection(url)
    try f(conn, new SnowflakeEmbedded(conn)) finally conn.close()
  }

  private def query[A](conn: java.sql.Connection, sql: String)(f: java.sql.ResultSet => A): Vector[A] = {
    val stmt = conn.createStatement()
    try {
      val rs = stmt.executeQuery(sql)
      val out = Vector.newBuilder[A]
      while (rs.next()) out += f(rs)
      rs.close(); out.result()
    } finally stmt.close()
  }

  private def sinkTo(exec: SnowflakeEmbedded, dir: java.nio.file.Path) =
    new SnowflakeExport.Sink("whdb", "orders", st, "pk", dir, exec.execute)

  test("full protocol executes: pages land as rows, second page upserts") {
    withDb { (conn, exec) =>
      val dir = java.nio.file.Files.createTempDirectory("snowlive")
      val sink = sinkTo(exec, dir)
      val t0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
      sink.writePage(Seq(
        Row(1L, "alpha", Map("k" -> "v"), t0),
        Row(2L, "say \"hi\",ok", null, null)), 0L)
      // row effects, not statement text
      val rows = query(conn, "SELECT pk, name, data, \"AT\" FROM whdb.orders ORDER BY pk")(r =>
        (r.getLong(1), r.getString(2), r.getString(3), r.getTimestamp(4)))
      assert(rows == Vector(
        (1L, "alpha", """{"k":"v"}""", t0),
        (2L, "say \"hi\",ok", null, null)))
      // page 2: pk=2 updated, pk=3 inserted — the MERGE's matched/unmatched arms
      sink.writePage(Seq(
        Row(2L, "beta", Map("x" -> "1"), t0),
        Row(3L, "gamma", null, null)), 1L)
      val after = query(conn, "SELECT pk, name, data FROM whdb.orders ORDER BY pk")(r =>
        (r.getLong(1), r.getString(2), r.getString(3)))
      assert(after == Vector(
        (1L, "alpha", """{"k":"v"}"""),
        (2L, "beta", """{"x":"1"}"""),
        (3L, "gamma", null)))
      // every temp stage was dropped (the DROP STAGE statements executed)
      assert(exec.stageNames.isEmpty)
    }
  }

  test("re-delivering the same page is idempotent (watermark redelivery contract)") {
    withDb { (conn, exec) =>
      val dir = java.nio.file.Files.createTempDirectory("snowlive")
      val sink = sinkTo(exec, dir)
      val page = Seq(Row(7L, "seven", Map("a" -> "b"), null))
      sink.writePage(page, 0L)
      // a crash-after-commit redelivers the page under a NEW page index
      // (same rows); the pk merge must converge, not duplicate
      sink.writePage(page, 1L)
      assert(query(conn, "SELECT count(*) FROM whdb.orders")(_.getLong(1)) == Vector(1L))
      assert(query(conn, "SELECT name FROM whdb.orders")(_.getString(1)) == Vector("seven"))
    }
  }

  test("schema evolution: a wider writer adds the column via the EXECUTE IMMEDIATE probe") {
    withDb { (conn, exec) =>
      val dir = java.nio.file.Files.createTempDirectory("snowlive")
      sinkTo(exec, dir).writePage(Seq(Row(1L, "a", null, null)), 0L)
      val wider = StructType(st.fields :+ StructField("extra", DoubleType))
      val sink2 = new SnowflakeExport.Sink("whdb", "orders", wider, "pk", dir, exec.execute)
      sink2.writePage(Seq(Row(1L, "a2", null, null, 1.5), Row(4L, "d", null, null, null)), 10L)
      val rows = query(conn, "SELECT pk, name, extra FROM whdb.orders ORDER BY pk")(r =>
        (r.getLong(1), r.getString(2), Option(r.getObject(3)).map(_.toString)))
      assert(rows == Vector(
        (1L, "a2", Some("1.5")),
        (4L, "d", None)))
    }
  }

  test("parse_json rejects a malformed OBJECT cell, transactionally") {
    withDb { (conn, exec) =>
      val dir = java.nio.file.Files.createTempDirectory("snowlive")
      val sink = sinkTo(exec, dir)
      sink.writePage(Seq(Row(1L, "keep", null, null)), 0L)
      // hand-stage a corrupt CSV through the raw protocol: valid shape, but
      // the OBJECT cell is not JSON — the merge must fail and roll back
      val bad = dir.resolve("bad.csv")
      java.nio.file.Files.write(bad,
        "pk,name,data,at\n9,\"x\",\"{not json\",\n".getBytes("UTF-8"))
      val stmts = SnowflakeExport.mergeFromStageStatements(
        "whdb", "orders", st, "pk", bad.toAbsolutePath.toString, "bad")
      exec.execute(stmts(0)); exec.execute(stmts(1))
      intercept[IllegalArgumentException](exec.execute(stmts(2)))
      exec.execute(stmts(3))
      assert(query(conn, "SELECT count(*) FROM whdb.orders")(_.getLong(1)) == Vector(1L))
    }
  }

  test("a staged page with duplicate pks is a nondeterministic merge, rejected") {
    withDb { (conn, exec) =>
      val dir = java.nio.file.Files.createTempDirectory("snowlive")
      sinkTo(exec, dir).writePage(Seq(Row(1L, "keep", null, null)), 0L)
      // Snowflake raises on a MERGE whose source matches one target row
      // twice; the embedded executor must refuse too, not land both rows
      val dup = dir.resolve("dup.csv")
      java.nio.file.Files.write(dup,
        "pk,name,data,at\n5,\"a\",,\n5,\"b\",,\n".getBytes("UTF-8"))
      val stmts = SnowflakeExport.mergeFromStageStatements(
        "whdb", "orders", st, "pk", dup.toAbsolutePath.toString, "dup")
      exec.execute(stmts(0)); exec.execute(stmts(1))
      val err = intercept[IllegalArgumentException](exec.execute(stmts(2)))
      assert(err.getMessage.contains("nondeterministic merge"))
      exec.execute(stmts(3))
      assert(query(conn, "SELECT count(*) FROM whdb.orders")(_.getLong(1)) == Vector(1L))
    }
  }

  test("the executor rejects statements outside the protocol (drift detector)") {
    withDb { (_, exec) =>
      intercept[IllegalArgumentException](exec.execute("SELECT 1"))
      intercept[IllegalArgumentException](exec.execute("DROP TABLE whdb.orders"))
    }
  }

  test("csv parse: quoted commas, doubled quotes, null vs empty, CRLF") {
    withDb { (_, exec) =>
      val parsed = exec.parseCsv(
        "a,b,c\r\n1,\"x,y\",\r\n2,\"he said \"\"hi\"\"\",\"\"\n")
      assert(parsed == Vector(
        Vector(Some("a"), Some("b"), Some("c")),
        Vector(Some("1"), Some("x,y"), None),
        Vector(Some("2"), Some("he said \"hi\""), Some(""))))
    }
  }
}

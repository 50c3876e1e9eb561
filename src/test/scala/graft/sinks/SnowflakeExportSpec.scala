package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Golden tests for the Snowflake dialect (`db_adapter/snowflake.rb:34-146`):
  * statement forms are the adapter's whole engine-side content (execution is
  * an external CLI session), so the strings are the contract. */
class SnowflakeExportSpec extends AnyFunSuite {

  private val st = StructType(Seq(
    StructField("pk", LongType),
    StructField("name", StringType),
    StructField("data", MapType(StringType, StringType)),
    StructField("at", TimestampType)))

  test("type map: scalars to snowflake types, composites to object") {
    assert(SnowflakeExport.sqlType(LongType) == "bigint")
    assert(SnowflakeExport.sqlType(StringType) == "text")
    assert(SnowflakeExport.sqlType(TimestampType) == "timestamptz")
    assert(SnowflakeExport.sqlType(DecimalType(12, 2)) == "numeric")
    assert(SnowflakeExport.sqlType(MapType(StringType, StringType)) == "object")
    assert(SnowflakeExport.sqlType(ArrayType(LongType)) == "object")
  }

  test("no index support, like the warehouse itself") {
    intercept[UnsupportedOperationException](SnowflakeExport.createIndexSql("t"))
  }

  test("create table golden") {
    assert(SnowflakeExport.createTableSql("whdb", "orders", st, ifNotExists = true) ==
      """CREATE TABLE IF NOT EXISTS whdb.orders (
        |  pk bigint,
        |  name text,
        |  data object,
        |  at timestamptz
        |)""".stripMargin)
  }

  test("conditional add column probes INFORMATION_SCHEMA with ILIKE") {
    val sql = SnowflakeExport.addColumnSql("whdb", "orders",
      StructField("extra", DoubleType), ifNotExists = true)
    assert(sql.startsWith("EXECUTE IMMEDIATE $$"))
    assert(sql.contains("SELECT * FROM INFORMATION_SCHEMA.COLUMNS"))
    assert(sql.contains("WHERE TABLE_SCHEMA ILIKE 'whdb'"))
    assert(sql.contains("AND TABLE_NAME ILIKE 'orders'"))
    assert(sql.contains("AND COLUMN_NAME ILIKE 'extra'"))
    assert(sql.contains("ALTER TABLE whdb.orders ADD COLUMN extra double precision;"))
    assert(sql.endsWith("$$"))
    // unconditional form is the bare ALTER
    assert(SnowflakeExport.addColumnSql("whdb", "orders", StructField("extra", DoubleType)) ==
      "ALTER TABLE whdb.orders ADD COLUMN extra double precision")
  }

  test("merge-from-stage golden: stage, PUT, positional MERGE, parse_json") {
    val stmts = SnowflakeExport.mergeFromStageStatements(
      "whdb", "orders", st, "pk", "/spool/orders_page_0.csv", "p0")
    assert(stmts(0) ==
      """CREATE STAGE whdb.graft_tempstage_p0_orders FILE_FORMAT = (type = 'CSV' skip_header = 1 FIELD_OPTIONALLY_ENCLOSED_BY = '"')""")
    assert(stmts(1) == "PUT file:///spool/orders_page_0.csv @whdb.graft_tempstage_p0_orders auto_compress=true")
    assert(stmts(2) ==
      """MERGE INTO whdb.orders AS tgt
        |  USING (
        |    SELECT $1 pk, $2 name, $3 data, $4 at FROM @whdb.graft_tempstage_p0_orders
        |  ) src
        |  ON tgt.pk = src.pk
        |  WHEN MATCHED THEN UPDATE SET name = src.name, data = parse_json(src.data), at = src.at
        |  WHEN NOT MATCHED THEN INSERT (pk, name, data, at) VALUES (src.pk, src.name, parse_json(src.data), src.at)""".stripMargin)
    assert(stmts(3) == "DROP STAGE IF EXISTS whdb.graft_tempstage_p0_orders")
  }

  test("csv render: header, quoting, embedded quotes, nulls") {
    val flat = StructType(Seq(
      StructField("pk", LongType), StructField("name", StringType)))
    val csv = SnowflakeExport.renderCsv(flat, Seq(
      Row(1L, "plain"), Row(2L, "say \"hi\",ok"), Row(3L, null)))
    assert(csv ==
      "pk,name\n" +
      "1,\"plain\"\n" +
      "2,\"say \"\"hi\"\",ok\"\n" +
      "3,\n")
  }

  test("csv render: OBJECT cells land as quoted JSON for parse_json") {
    val withMap = StructType(Seq(
      StructField("pk", LongType),
      StructField("data", MapType(StringType, StringType))))
    val csv = SnowflakeExport.renderCsv(withMap, Seq(
      Row(1L, Map("k" -> "v", "k2" -> "with,comma")),
      Row(2L, null)))
    val lines = csv.split("\n")
    // one quoted cell (commas inside must not split the row), valid JSON inside
    assert(lines(1) == "1,\"{\"\"k\"\":\"\"v\"\",\"\"k2\"\":\"\"with,comma\"\"}\"")
    assert(lines(2) == "2,")
  }

  test("sink drives ensure-schema once then stage+merge per page") {
    val dir = java.nio.file.Files.createTempDirectory("snowspool")
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    val sink = new SnowflakeExport.Sink("whdb", "orders", st, "pk", dir, ran += _)
    sink.writePage(Seq(Row(1L, "a", null, null)), 0L)
    sink.writePage(Seq(Row(2L, "b", null, null)), 1L)
    // ensure = CREATE SCHEMA + CREATE TABLE + 4 conditional ADD COLUMNs
    assert(ran.take(2) == Seq(
      "CREATE SCHEMA IF NOT EXISTS whdb",
      SnowflakeExport.createTableSql("whdb", "orders", st, ifNotExists = true)))
    assert(ran.slice(2, 6).forall(_.startsWith("EXECUTE IMMEDIATE")))
    // then per page: CREATE STAGE / PUT / MERGE / DROP STAGE, ensure not repeated
    val pages = ran.drop(6)
    assert(pages.size == 8)
    assert(pages(0).startsWith("CREATE STAGE whdb.graft_tempstage_p0_orders"))
    assert(pages(4).startsWith("CREATE STAGE whdb.graft_tempstage_p1_orders"))
    assert(!pages.exists(_.startsWith("CREATE SCHEMA")))
    // the spooled CSV is what PUT references
    val spooled = new String(java.nio.file.Files.readAllBytes(
      dir.resolve("orders_page_0.csv")), "UTF-8")
    assert(spooled.startsWith("pk,name,data,at\n1,\"a\",,"))
    assert(pages(1).contains(dir.resolve("orders_page_0.csv").toAbsolutePath.toString))
  }
}

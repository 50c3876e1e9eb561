package graft.plans

import graft.SparkSpec
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
}

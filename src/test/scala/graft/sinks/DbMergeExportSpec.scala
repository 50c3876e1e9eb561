package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.types._

/** K1 staged-merge protocol contract + the file-page sink vehicle. */
class DbMergeExportSpec extends SparkSpec {
  import spark.implicits._

  private val st = StructType(Seq(
    StructField("pk", LongType),
    StructField("stripe_id", StringType),
    StructField("amount", LongType),
    StructField("updated", TimestampType)))

  test("schema-sync DDL is idempotent and typed") {
    val ddl = DbMergeExport.ensureSchemaDdl("org1", "stripe_charge_v1", st)
    assert(ddl.head == "CREATE SCHEMA IF NOT EXISTS org1")
    assert(ddl(1).contains("CREATE TABLE IF NOT EXISTS org1.stripe_charge_v1"))
    assert(ddl(1).contains("updated timestamptz"))
    assert(ddl.count(_.contains("ADD COLUMN IF NOT EXISTS")) == st.size)
    assertThrows[IllegalArgumentException](
      DbMergeExport.ensureSchemaDdl("bad;drop", "t", st))
  }

  test("page merge statements stage, update matches, insert the rest") {
    val rows = Seq(
      org.apache.spark.sql.Row(1L, "ch_1", 100L, null),
      org.apache.spark.sql.Row(2L, "ch_2", 200L, null))
    val (stmts, binds) = DbMergeExport.statementsForPage("org1", "t", st, "pk", rows)
    assert(stmts.head.startsWith("CREATE TEMP TABLE t_staging (LIKE org1.t)"))
    assert(stmts(1) == "INSERT INTO t_staging (pk, stripe_id, amount, updated) VALUES (?, ?, ?, ?)")
    assert(stmts(2).contains("UPDATE org1.t AS tgt SET stripe_id = src.stripe_id"))
    assert(!stmts(2).contains("pk = src.pk,")) // pk never in the SET list
    assert(stmts(3).contains("WHERE NOT EXISTS"))
    assert(binds == rows.map(_.toSeq))
  }

  test("warehouse staged-load statements follow put/copy/merge order (K2)") {
    val stmts = DbMergeExport.warehouseStatements("org1", "t", st, "pk", "/tmp/page0.csv")
    assert(stmts.head == "CREATE TEMP TABLE t_staging LIKE org1.t")
    assert(stmts(1).startsWith("PUT file:///tmp/page0.csv"))
    assert(stmts(2).startsWith("COPY INTO t_staging"))
    assert(stmts(3).contains("UPDATE org1.t"))
    assert(stmts(4).contains("NOT EXISTS"))
  }

  test("file page sink lands ordered pages consumable as one dataset") {
    val dir = java.nio.file.Files.createTempDirectory("fps").toString
    val table = (1 to 7).map(i => (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-0$i%d 00:00:00")))
      .toDF("id", "updated")
    val sink = new DbMergeExport.FilePageSink(s"$dir/out", table.schema, spark)
    val r = SyncTarget.sync(table, "updated",
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-07 00:00:00"), pageSize = 3, sink)
    assert(r.pagesDelivered == 3)
    val back = spark.read.parquet(s"$dir/out/page=*")
    assert(back.count() == 7)
  }
}

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

  test("JDBC page sink executes the staged merge against a live embedded DB (K1)") {
    import java.sql.{DriverManager, Timestamp}
    val url = s"jdbc:derby:memory:graft${System.nanoTime()};create=true"
    val tdf = Seq(
      (1L, "ch_1", 100L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, "ch_2", 200L, Timestamp.valueOf("2024-01-02 00:00:00")),
      (3L, "ch_3", 300L, Timestamp.valueOf("2024-01-03 00:00:00")),
      (4L, "ch_4", 400L, Timestamp.valueOf("2024-01-04 00:00:00")))
      .toDF("pk", "stripe_id", "amount", "updated")
    val sink = new JdbcPageSink.Sink(url, "org1", "charges", st, "pk")
    val r1 = SyncTarget.sync(tdf, "updated",
      Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2024-01-04 00:00:00"), pageSize = 3, sink)
    assert(r1.pagesDelivered == 2 && r1.rowsDelivered == 4)

    def readBack(): Map[Long, Long] = {
      val c = DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery(
          "SELECT pk, amount FROM org1.charges")
        Iterator.continually(rs)
          .takeWhile(_.next()).map(r => r.getLong(1) -> r.getLong(2)).toMap
      } finally c.close()
    }
    assert(readBack() == Map(1L -> 100L, 2L -> 200L, 3L -> 300L, 4L -> 400L))

    // incremental second pass: pk 3 updated + pk 5 inserted; merge keeps the
    // table keyed (no duplicate pks), untouched rows intact
    val tdf2 = Seq(
      (3L, "ch_3", 999L, Timestamp.valueOf("2024-01-05 00:00:00")),
      (5L, "ch_5", 500L, Timestamp.valueOf("2024-01-06 00:00:00")))
      .toDF("pk", "stripe_id", "amount", "updated")
    val r2 = SyncTarget.sync(tdf2, "updated",
      Timestamp.valueOf("2024-01-04 00:00:00"),
      Timestamp.valueOf("2024-01-07 00:00:00"), pageSize = 10, sink)
    assert(r2.rowsDelivered == 2)
    assert(readBack() == Map(1L -> 100L, 2L -> 200L, 3L -> 999L, 4L -> 400L, 5L -> 500L))
    sink.close()
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

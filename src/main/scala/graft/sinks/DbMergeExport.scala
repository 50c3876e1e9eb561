package graft.sinks

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** K1 — database sync-target export, the staged-merge protocol of
  * `lib/webhookdb/db_adapter/pg.rb:205-224` + `sync_target.rb:618-672`:
  * ensure schema (`CREATE SCHEMA/TABLE IF NOT EXISTS`, `ADD COLUMN IF NOT
  * EXISTS` diffs cached by last-applied schema), stage a page into a temp
  * table, then `UPDATE ... FROM` matches and `INSERT` the rest.
  *
  * The container has no database, so the statement generation (the protocol)
  * is the tested unit; a JDBC `PageSink` executes `statementsForPage` +
  * `ensureSchemaDdl` verbatim against a live connection. Values are bound as
  * parameters — the generator never inlines data.
  */
object DbMergeExport {

  private def q(ident: String): String = {
    require(ident.matches("[A-Za-z_][A-Za-z0-9_]{0,62}"), s"invalid identifier: $ident")
    ident
  }

  def sqlType(dt: org.apache.spark.sql.types.DataType): String = dt.typeName match {
    case "string" => "text"
    case "long" => "bigint"
    case "integer" => "integer"
    case "double" => "double precision"
    case "boolean" => "boolean"
    case "timestamp" => "timestamptz"
    case "date" => "date"
    case t if t.startsWith("decimal") => "numeric"
    case "binary" => "bytea"
    case _ => "jsonb"
  }

  /** Schema-sync DDL (idempotent; the caller caches the last applied schema
    * and skips when unchanged — `sync_target.rb:618-640`). */
  def ensureSchemaDdl(schema: String, table: String, st: StructType): Seq[String] = {
    val cols = st.fields.map(f => s"${q(f.name)} ${sqlType(f.dataType)}")
    Seq(
      s"CREATE SCHEMA IF NOT EXISTS ${q(schema)}",
      s"CREATE TABLE IF NOT EXISTS ${q(schema)}.${q(table)} (${cols.mkString(", ")})"
    ) ++ st.fields.map(f =>
      s"ALTER TABLE ${q(schema)}.${q(table)} ADD COLUMN IF NOT EXISTS ${q(f.name)} ${sqlType(f.dataType)}")
  }

  /** The per-page staged merge: temp-table stage + update-matched +
    * insert-missing, keyed on `pkCol` (`pg.rb:205-224`). Returns
    * (statements, per-row bind values). */
  def statementsForPage(schema: String, table: String, st: StructType,
                        pkCol: String, page: Seq[Row]): (Seq[String], Seq[Seq[Any]]) = {
    require(st.fieldNames.contains(pkCol), s"missing pk column $pkCol")
    // the staging name must itself fit the 63-byte identifier cap the
    // validator enforces (db_adapter.rb:20) — a 60-char table name would
    // otherwise generate DDL Postgres truncates into collisions
    require(table.length + "_staging".length <= 63,
      s"table name too long for a staging suffix: $table")
    val t = s"${q(schema)}.${q(table)}"
    val tmp = s"${q(table)}_staging"
    val cols = st.fieldNames.map(q)
    val placeholders = cols.map(_ => "?").mkString(", ")
    val setClauses = cols.filterNot(_ == pkCol)
      .map(c => s"$c = src.$c").mkString(", ")
    val stmts = Seq(
      s"CREATE TEMP TABLE $tmp (LIKE $t) ON COMMIT DROP",
      s"INSERT INTO $tmp (${cols.mkString(", ")}) VALUES ($placeholders)",
      s"""UPDATE $t AS tgt SET $setClauses FROM $tmp AS src
         |WHERE tgt.${q(pkCol)} = src.${q(pkCol)}""".stripMargin,
      s"""INSERT INTO $t SELECT src.* FROM $tmp AS src
         |WHERE NOT EXISTS (SELECT 1 FROM $t AS tgt WHERE tgt.${q(pkCol)} = src.${q(pkCol)})""".stripMargin)
    val binds = page.map(_.toSeq)
    (stmts, binds)
  }

  /** K2 — warehouse-style staged load (`db_adapter/snowflake.rb:81-146`):
    * upload a page file to a stage, COPY it into a temp table, then the same
    * update+insert merge. The generator returns the statement sequence a
    * warehouse session executes around an uploaded file path. */
  def warehouseStatements(schema: String, table: String, st: StructType,
                          pkCol: String, stagedFile: String): Seq[String] = {
    require(st.fieldNames.contains(pkCol), s"missing pk column $pkCol")
    require(table.length + "_staging".length <= 63,
      s"table name too long for a staging suffix: $table")
    val t = s"${q(schema)}.${q(table)}"
    val tmp = s"${q(table)}_staging"
    val cols = st.fieldNames.map(q)
    val setClauses = cols.filterNot(_ == pkCol).map(c => s"$c = src.$c").mkString(", ")
    Seq(
      s"CREATE TEMP TABLE $tmp LIKE $t",
      s"PUT file://$stagedFile @%$tmp auto_compress=true",
      s"COPY INTO $tmp FROM @%$tmp FILE_FORMAT = (TYPE = CSV FIELD_OPTIONALLY_ENCLOSED_BY = '\"')",
      s"""UPDATE $t AS tgt SET $setClauses FROM $tmp AS src
         |WHERE tgt.${q(pkCol)} = src.${q(pkCol)}""".stripMargin,
      s"""INSERT INTO $t SELECT src.* FROM $tmp AS src
         |WHERE NOT EXISTS (SELECT 1 FROM $t AS tgt WHERE tgt.${q(pkCol)} = src.${q(pkCol)})""".stripMargin)
  }

  /** A PageSink that lands pages as parquet part files — the CSV/COPY
    * staging analog for file-based consumers (also the local test vehicle
    * for the page protocol). */
  final class FilePageSink(dir: String, schema: StructType,
                           spark: org.apache.spark.sql.SparkSession)
      extends SyncTarget.PageSink {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    def writePage(page: Seq[Row], pageIdx: Long): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(page.toIndexedSeq, 1), schema)
        .write.mode("overwrite").parquet(s"$dir/page=$pageIdx")
  }
}

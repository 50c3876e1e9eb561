package graft.plans

import org.apache.spark.sql.types._

/** K5 — the "FDW payload": generated DDL that lets an external engine mount
  * the replicated tables (`organization/db_builder.rb:358-400` generates
  * postgres_fdw server/import/matview statements). Here the export target is
  * any Spark-SQL-speaking engine (Thrift server, another catalog): we
  * generate `CREATE VIEW`/`CREATE TABLE ... USING` DDL plus the per-table
  * materialized-view refresh statements.
  */
object FdwExport {

  final case class TableExport(name: String, schema: StructType, location: String)

  private def sqlType(dt: DataType): String = dt.sql

  def validIdentifier(s: String): Boolean =
    s.matches("[A-Za-z_][A-Za-z0-9_]{0,62}") // db_adapter.rb:10-22, 63-byte cap

  /** External-mount DDL for one replicated table (parquet location). */
  def createTableDdl(t: TableExport): String = {
    require(validIdentifier(t.name), s"invalid identifier: ${t.name}")
    val cols = t.schema.fields
      .map(f => s"  ${f.name} ${sqlType(f.dataType)}").mkString(",\n")
    s"""CREATE TABLE IF NOT EXISTS ${t.name} (
       |$cols
       |) USING parquet LOCATION '${t.location}'""".stripMargin
  }

  /** Materialized-view-style DDL (engine-side cache of the mounted table). */
  def createMatViewDdl(t: TableExport, viewSchema: String): String = {
    require(validIdentifier(viewSchema), s"invalid identifier: $viewSchema")
    s"CREATE OR REPLACE VIEW $viewSchema.${t.name} AS SELECT * FROM ${t.name}"
  }

  /** The whole-org export script (`db_builder.rb` admin_url/fetch loop). */
  def exportScript(tables: Seq[TableExport], viewSchema: String): String =
    (Seq(s"CREATE SCHEMA IF NOT EXISTS $viewSchema") ++
      tables.map(createTableDdl) ++
      tables.map(createMatViewDdl(_, viewSchema))).mkString(";\n") + ";"
}

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

  /** External-mount DDL for one replicated table (parquet location). Every
    * interpolated token is validated: column names are identifiers, and the
    * location must be quote/semicolon-free — exportScript joins statements
    * with ';', so an unchecked location is a statement-injection vector
    * into the script shipped to the external engine. */
  def createTableDdl(t: TableExport): String = {
    require(validIdentifier(t.name), s"invalid identifier: ${t.name}")
    t.schema.fieldNames.foreach(c =>
      require(validIdentifier(c), s"invalid column identifier: $c"))
    require(!t.location.contains("'") && !t.location.contains(";"),
      s"location must be quote/semicolon-free: ${t.location}")
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

  // ---- the reference's own postgres_fdw payload ----------------------------

  /** Remote-connection facts the payload embeds (the parsed readonly URL of
    * `db_builder.rb:366`). */
  final case class RemoteConn(host: String, port: Int, dbname: String,
                              user: String, password: String)

  /** One service integration to expose as a materialized view
    * (`service_integrations` loop, `db_builder.rb:386-391`). */
  final case class Integration(opaqueId: String, serviceName: String, tableName: String)

  /** `generate_fdw_payload`'s result shape (`db_builder.rb:395-400`). */
  final case class Payload(fdwSql: String, viewsSql: String, compoundSql: String,
                           views: Map[String, String])

  /** The postgres_fdw mount payload, statement-for-statement the reference's
    * `generate_fdw_payload` (`db_builder.rb:358-400`): extension, drop+create
    * server, user mapping, local schema + IMPORT FOREIGN SCHEMA, view schema,
    * then one CREATE MATERIALIZED VIEW per integration (sorted by statement
    * text, as the reference sorts `views.values`). */
  def fdwPayload(remoteServerName: String, fetchSize: Int, localSchema: String,
                 viewSchema: String, conn: RemoteConn, orgSchema: String,
                 integrations: Seq[Integration]): Payload = {
    val idents = Seq(remoteServerName, localSchema, viewSchema, orgSchema) ++
      integrations.flatMap(i => Seq(i.serviceName, i.tableName))
    idents.foreach(i => require(validIdentifier(i), s"invalid identifier: $i"))
    require(fetchSize > 0, "no arg can be blank")
    Seq(conn.host, conn.dbname, conn.user, conn.password).foreach(v =>
      require(v.nonEmpty && !v.contains("'") && !v.contains(";"),
        "connection fields must be non-blank and quote/semicolon-free"))
    val fdwSql =
      s"""CREATE EXTENSION IF NOT EXISTS postgres_fdw;
         |DROP SERVER IF EXISTS $remoteServerName CASCADE;
         |CREATE SERVER $remoteServerName
         |  FOREIGN DATA WRAPPER postgres_fdw
         |  OPTIONS (host '${conn.host}', port '${conn.port}', dbname '${conn.dbname}', fetch_size '$fetchSize');
         |
         |CREATE USER MAPPING FOR CURRENT_USER
         |  SERVER $remoteServerName
         |  OPTIONS (user '${conn.user}', password '${conn.password}');
         |
         |CREATE SCHEMA IF NOT EXISTS $localSchema;
         |IMPORT FOREIGN SCHEMA $orgSchema
         |  FROM SERVER $remoteServerName
         |  INTO $localSchema;
         |
         |CREATE SCHEMA IF NOT EXISTS $viewSchema;
         |""".stripMargin
    val views = integrations.map(i => i.opaqueId ->
      (s"CREATE MATERIALIZED VIEW IF NOT EXISTS $viewSchema.${i.serviceName} " +
        s"AS SELECT * FROM $localSchema.${i.tableName};")).toMap
    val viewsSql = views.values.toSeq.sorted.mkString("\n")
    Payload(fdwSql, viewsSql, s"$fdwSql\n$viewsSql", views)
  }
}

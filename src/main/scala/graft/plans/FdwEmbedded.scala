package graft.plans

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** An in-process executor for the postgres_fdw payload [[FdwExport.fdwPayload]]
  * generates — the PG-side counterpart the container lacks, backed by the
  * live Spark catalog so tests assert MOUNT EFFECTS (do the matviews serve
  * the remote rows?) instead of only statement text.
  *
  * Statement semantics (`db_builder.rb:358-400`'s expectations of Postgres):
  *  - CREATE SERVER registers a named remote whose `dbname` option resolves,
  *    here, to a Spark database playing the remote org DB;
  *  - CREATE USER MAPPING attaches credentials to the server; IMPORT fails
  *    without one, as postgres_fdw would at connect time;
  *  - IMPORT FOREIGN SCHEMA mounts every table of the remote schema as a
  *    foreign table in the local schema (views over the remote catalog);
  *  - CREATE MATERIALIZED VIEW materializes the mounted table into a real
  *    table in the view schema (IF NOT EXISTS = first-create wins until a
  *    DROP, Postgres matview semantics);
  *  - DROP SERVER .. CASCADE unregisters the server and drops the foreign
  *    tables imported through it.
  *
  * Everything else is rejected, so the executor doubles as a drift detector
  * for the generator: a payload-shape change fails execution loudly.
  */
final class FdwEmbedded(spark: SparkSession) {

  private final case class Server(dbname: String, var userMapped: Boolean,
                                  imported: mutable.Set[String], // local views created
                                  matviews: mutable.Set[String]) // matviews over them
  private val servers = mutable.Map[String, Server]()

  def serverNames: Set[String] = servers.keySet.toSet

  private val CreateExtRe = """CREATE EXTENSION IF NOT EXISTS postgres_fdw""".r
  private val DropServerRe = """DROP SERVER IF EXISTS (\w+) CASCADE""".r
  private val CreateServerRe =
    """(?s)CREATE SERVER (\w+)\s+FOREIGN DATA WRAPPER postgres_fdw\s+OPTIONS \(host '([^']*)', port '(\d+)', dbname '([^']*)', fetch_size '(\d+)'\)""".r
  private val UserMappingRe =
    """(?s)CREATE USER MAPPING FOR CURRENT_USER\s+SERVER (\w+)\s+OPTIONS \(user '([^']*)', password '([^']*)'\)""".r
  private val CreateSchemaRe = """CREATE SCHEMA IF NOT EXISTS (\w+)""".r
  private val ImportRe =
    """(?s)IMPORT FOREIGN SCHEMA (\w+)\s+FROM SERVER (\w+)\s+INTO (\w+)""".r
  private val MatViewRe =
    """CREATE MATERIALIZED VIEW IF NOT EXISTS (\w+)\.(\w+) AS SELECT \* FROM (\w+)\.(\w+)""".r

  /** Execute a whole payload (fdw, views, or compound): statements split on
    * `;` — the generator guarantees no embedded semicolons in values. */
  def executeScript(script: String): Unit =
    script.split(";").map(_.trim).filter(_.nonEmpty).foreach(execute)

  def execute(stmt: String): Unit = stmt match {
    case CreateExtRe() => () // the wrapper is built in here
    case DropServerRe(name) =>
      // Postgres cascades through the foreign tables to every matview
      // defined over them — dropping only the imported views would let
      // matviews survive here that the real PG side removes, and a test
      // green against this double would fail against Postgres.
      servers.remove(name).foreach { s =>
        s.matviews.foreach(mv => spark.sql(s"DROP TABLE IF EXISTS $mv"))
        s.imported.foreach(v => spark.sql(s"DROP VIEW IF EXISTS $v"))
      }
    case CreateServerRe(name, _host, _port, dbname, fetchSize) =>
      require(!servers.contains(name), s"server already exists: $name")
      require(fetchSize.toInt > 0, "fetch_size must be positive")
      servers(name) = Server(dbname, userMapped = false,
        mutable.Set.empty, mutable.Set.empty)
    case UserMappingRe(server, user, _password) =>
      val s = servers.getOrElse(server,
        throw new IllegalArgumentException(s"user mapping for unknown server: $server"))
      require(user.nonEmpty, "user mapping needs a user")
      s.userMapped = true
    case CreateSchemaRe(schema) =>
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $schema"); ()
    case ImportRe(orgSchema, server, localSchema) =>
      val s = servers.getOrElse(server,
        throw new IllegalArgumentException(s"import from unknown server: $server"))
      // postgres_fdw connects with the mapped credentials at import time —
      // no mapping, no connection
      require(s.userMapped, s"no user mapping for server $server")
      require(spark.catalog.databaseExists(orgSchema),
        s"remote schema does not exist: $orgSchema")
      spark.catalog.listTables(orgSchema).collect()
        .filterNot(_.isTemporary)
        .foreach { t =>
          val local = s"$localSchema.${t.name}"
          spark.sql(s"CREATE OR REPLACE VIEW $local AS SELECT * FROM $orgSchema.${t.name}")
          s.imported += local
        }
    case MatViewRe(viewSchema, viewName, localSchema, tableName) =>
      // IF NOT EXISTS: first materialization wins until dropped
      if (!spark.catalog.tableExists(s"$viewSchema.$viewName")) {
        spark.sql(s"CREATE TABLE $viewSchema.$viewName USING parquet " +
          s"AS SELECT * FROM $localSchema.$tableName")
        // record the dependency for DROP SERVER .. CASCADE
        servers.values.find(_.imported.contains(s"$localSchema.$tableName"))
          .foreach(_.matviews += s"$viewSchema.$viewName")
      }
    case other =>
      throw new IllegalArgumentException(
        s"statement outside the fdw payload protocol: ${other.take(120)}")
  }

  /** `REFRESH MATERIALIZED VIEW` equivalent: re-materialize from the mounted
    * table (the maintenance statement a payload consumer runs on schedule). */
  def refreshMatView(viewSchema: String, viewName: String, localSchema: String,
                     tableName: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $viewSchema.$viewName")
    spark.sql(s"CREATE TABLE $viewSchema.$viewName USING parquet " +
      s"AS SELECT * FROM $localSchema.$tableName")
  }
}

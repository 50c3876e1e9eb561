package graft.sinks

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.sql.{Connection, DriverManager}

/** K1 executed live — a [[SyncTarget.PageSink]] that drives the staged-merge
  * protocol (`sync_target.rb:618-672`, `db_adapter/pg.rb:205-224`) over a
  * real JDBC connection: ensure schema once, then per page stage -> merge.
  *
  * Like the reference's `db_adapter` layer (pg.rb vs snowflake.rb), the
  * statement FORMS are per-dialect while the protocol is shared;
  * [[DbMergeExport]] holds the Postgres generator, [[JdbcPageSink.Derby]]
  * speaks the embedded-Derby dialect the tests execute in-process
  * (no `UPDATE .. FROM`/`IF NOT EXISTS` there, so the merge is the
  * delete-matched + insert-all equivalent and existence errors are the
  * idempotence signal).
  */
object JdbcPageSink {

  /** Statement forms for one target database (`db_adapter.rb`'s role). */
  trait Dialect {
    def sqlType(dt: DataType): String
    /** Idempotently ensure schema + table + columns exist. */
    def ensureSchema(conn: Connection, schema: String, table: String,
                     st: StructType): Unit
    /** Stage one page and merge it into the target on `pkCol`. */
    def mergePage(conn: Connection, schema: String, table: String,
                  st: StructType, pkCol: String, page: Seq[Row]): Unit
  }

  /** Embedded Apache Derby (`jdbc:derby:memory:...`) — the in-process test
    * target. Derby lacks `IF NOT EXISTS`, `UPDATE ... FROM` and `ON COMMIT
    * DROP` temp tables; the protocol maps to: ignore already-exists
    * SQLStates on DDL, a persistent staging table truncated per page, and
    * delete-matched + insert-all (row-equivalent to update+insert). */
  object Derby extends Dialect {
    def sqlType(dt: DataType): String = dt.typeName match {
      case "string" => "VARCHAR(32672)"
      case "long" => "BIGINT"
      case "integer" => "INTEGER"
      case "double" => "DOUBLE"
      case "boolean" => "BOOLEAN"
      case "timestamp" => "TIMESTAMP"
      case "date" => "DATE"
      case t if t.startsWith("decimal") => "DECIMAL(31,6)"
      case "binary" => "BLOB"
      case _ => "VARCHAR(32672)" // json etc. as text
    }

    /** Run DDL, swallowing only "already exists" states (the Derby spelling
      * of IF NOT EXISTS): X0Y68 schema/object, X0Y32 table/column. */
    private def ddl(conn: Connection, sql: String): Unit = {
      val stmt = conn.createStatement()
      try stmt.executeUpdate(sql)
      catch {
        case e: java.sql.SQLException
          if e.getSQLState == "X0Y68" || e.getSQLState == "X0Y32" => ()
      } finally stmt.close()
    }

    def ensureSchema(conn: Connection, schema: String, table: String,
                     st: StructType): Unit = {
      ddl(conn, s"CREATE SCHEMA $schema")
      val cols = st.fields.map(f => s"${f.name} ${sqlType(f.dataType)}")
      ddl(conn, s"CREATE TABLE $schema.$table (${cols.mkString(", ")})")
      st.fields.foreach(f =>
        ddl(conn, s"ALTER TABLE $schema.$table ADD COLUMN ${f.name} ${sqlType(f.dataType)}"))
      ddl(conn, s"CREATE TABLE $schema.${table}_staging (${cols.mkString(", ")})")
      // Staging must evolve with the target: if a staging table persists from
      // a run with an older schema, its CREATE above is swallowed and the
      // per-page INSERT with the new column list would fail.
      st.fields.foreach(f =>
        ddl(conn, s"ALTER TABLE $schema.${table}_staging ADD COLUMN ${f.name} ${sqlType(f.dataType)}"))
    }

    def mergePage(conn: Connection, schema: String, table: String,
                  st: StructType, pkCol: String, page: Seq[Row]): Unit = {
      val t = s"$schema.$table"
      val tmp = s"$schema.${table}_staging"
      val cols = st.fieldNames
      val autoCommit = conn.getAutoCommit
      conn.setAutoCommit(false)
      try {
        val clear = conn.createStatement()
        try clear.executeUpdate(s"DELETE FROM $tmp") finally clear.close()
        val ins = conn.prepareStatement(
          s"INSERT INTO $tmp (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})")
        try {
          page.foreach { row =>
            cols.indices.foreach(i => ins.setObject(i + 1, row.get(i)))
            ins.addBatch()
          }
          ins.executeBatch()
        } finally ins.close()
        val merge = conn.createStatement()
        try {
          merge.executeUpdate(
            s"DELETE FROM $t WHERE $pkCol IN (SELECT $pkCol FROM $tmp)")
          merge.executeUpdate(s"INSERT INTO $t SELECT * FROM $tmp")
        } finally merge.close()
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally conn.setAutoCommit(autoCommit)
    }
  }

  /** The sink: one connection per sync run, schema ensured lazily on the
    * first page. Page delivery is transactional — a failed page rolls back
    * whole, matching the watermark contract (a crash re-delivers at most the
    * uncommitted page; the pk merge makes re-delivery idempotent). */
  final class Sink(url: String, schema: String, table: String,
                   st: StructType, pkCol: String,
                   dialect: Dialect = Derby)
      extends SyncTarget.PageSink with AutoCloseable {
    require(st.fieldNames.contains(pkCol), s"missing pk column $pkCol")
    @volatile private var opened = false
    private lazy val conn: Connection = {
      val c = DriverManager.getConnection(url)
      dialect.ensureSchema(c, schema, table, st)
      opened = true
      c
    }
    def writePage(page: Seq[Row], pageIdx: Long): Unit =
      if (page.nonEmpty) dialect.mergePage(conn, schema, table, st, pkCol, page)
    /** Closing a sink that never delivered a page must not open (and DDL)
      * a connection just to close it. */
    def close(): Unit = if (opened) conn.close()
  }
}

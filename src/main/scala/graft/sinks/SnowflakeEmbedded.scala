package graft.sinks

import java.sql.Connection
import scala.collection.mutable

/** An in-process executor for the Snowflake statement protocol that
  * [[SnowflakeExport]] generates — the warehouse-side counterpart the
  * container lacks, backed by embedded Derby so tests can assert ROW
  * EFFECTS (did the merge upsert?) instead of only statement text.
  *
  * The reference executes its generated statements through an external CLI
  * session (`db_adapter/snowflake.rb:10-26`); this class plays the role of
  * that session for the five statement families the protocol uses:
  * CREATE SCHEMA / CREATE TABLE / EXECUTE IMMEDIATE add-column probe /
  * CREATE STAGE + PUT + MERGE + DROP STAGE. Anything else is rejected —
  * the executor doubles as a drift detector for the generator: if a
  * statement form changes shape, execution fails loudly rather than the
  * golden string silently diverging from what a warehouse would accept.
  *
  * Semantics implemented per family (the Snowflake behaviors the reference
  * relies on, `snowflake.rb:34-146`):
  *  - stages are named row containers; PUT parses the staged CSV with the
  *    declared file format (skip_header=1, optionally `"`-enclosed, empty
  *    unquoted cell = NULL — `renderCsv`'s conventions);
  *  - MERGE reads the stage positionally (`$1..$n` aliases), updates
  *    matched pk rows and inserts the rest, in one transaction;
  *  - `parse_json(src.c)` validates the cell is well-formed JSON before it
  *    lands (Snowflake would reject the merge otherwise); Derby stores the
  *    validated text in the VARCHAR column standing in for OBJECT;
  *  - the conditional add-column block is honored by swallowing Derby's
  *    duplicate-column state, exactly the reference's IF-NOT-EXISTS intent.
  */
final class SnowflakeEmbedded(conn: Connection) {

  /** name -> staged rows (each cell None = NULL). */
  private val stages = mutable.Map[String, Vector[Vector[Option[String]]]]()

  def stageNames: Set[String] = stages.keySet.toSet

  /** Snowflake column type -> Derby column type. OBJECT lands as text — the
    * embedded stand-in for a VARIANT/OBJECT column. */
  private def derbyType(sf: String): String = sf.trim.toLowerCase match {
    case "text" => "VARCHAR(32672)"
    case "bigint" => "BIGINT"
    case "integer" => "INTEGER"
    case "double precision" | "float" => "DOUBLE"
    case "boolean" => "BOOLEAN"
    case "timestamptz" => "TIMESTAMP"
    case "date" => "DATE"
    case "numeric" => "DECIMAL(31,6)"
    case "object" => "VARCHAR(32672)"
    case other => throw new IllegalArgumentException(s"unmapped snowflake type: $other")
  }

  /** Derby-side identifier: quoted + uppercased, so column names that are
    * Derby reserved words (e.g. `at`) stay usable and metadata lookups see
    * the same canonical form as unquoted identifiers would. */
  private def qi(ident: String): String = "\"" + ident.toUpperCase + "\""

  private def ddl(sql: String, swallow: Set[String]): Unit = {
    val stmt = conn.createStatement()
    try stmt.executeUpdate(sql)
    catch {
      case e: java.sql.SQLException if swallow.contains(e.getSQLState) => ()
    } finally stmt.close()
  }

  private val CreateSchemaRe = """(?s)CREATE SCHEMA IF NOT EXISTS (\w+)""".r
  private val CreateTableRe = """(?s)CREATE TABLE (IF NOT EXISTS )?(\w+)\.(\w+) \((.*)\)""".r
  private val ExecImmediateRe = """(?s)EXECUTE IMMEDIATE \$\$.*?(ALTER TABLE \w+\.\w+ ADD COLUMN \w+ [\w ]+);.*\$\$""".r
  private val AlterRe = """ALTER TABLE (\w+)\.(\w+) ADD COLUMN (\w+) ([\w ]+)""".r
  private val CreateStageRe = """CREATE STAGE ([\w.]+) FILE_FORMAT = \(type = 'CSV' skip_header = 1 FIELD_OPTIONALLY_ENCLOSED_BY = '"'\)""".r
  private val PutRe = """PUT file://(\S+) @([\w.]+) auto_compress=true""".r
  private val MergeRe =
    ("""(?s)MERGE INTO (\w+)\.(\w+) AS tgt\s+USING \(\s*SELECT (.*?) FROM @([\w.]+)\s*\) src\s+""" +
      """ON tgt\.(\w+) = src\.\5\s+WHEN MATCHED THEN UPDATE SET (.*?)\s+""" +
      """WHEN NOT MATCHED THEN INSERT \((.*?)\) VALUES \((.*?)\)""").r
  private val DropStageRe = """DROP STAGE IF EXISTS ([\w.]+)""".r

  def execute(sql: String): Unit = sql match {
    case CreateSchemaRe(schema) =>
      ddl(s"CREATE SCHEMA ${qi(schema)}", Set("X0Y68"))
    case CreateTableRe(ine, schema, table, cols) =>
      val colDefs = cols.split(",\n").map(_.trim).map { c =>
        val Array(name, tpe) = c.split(" ", 2)
        s"${qi(name)} ${derbyType(tpe)}"
      }
      ddl(s"CREATE TABLE ${qi(schema)}.${qi(table)} (${colDefs.mkString(", ")})",
        if (ine != null) Set("X0Y32") else Set.empty)
    case ExecImmediateRe(alter) =>
      // the probe's IF-NOT-EXISTS intent = swallow duplicate-column
      alter match {
        case AlterRe(schema, table, col, tpe) =>
          ddl(s"ALTER TABLE ${qi(schema)}.${qi(table)} ADD COLUMN ${qi(col)} ${derbyType(tpe)}",
            Set("X0Y32"))
      }
    case AlterRe(schema, table, col, tpe) =>
      ddl(s"ALTER TABLE ${qi(schema)}.${qi(table)} ADD COLUMN ${qi(col)} ${derbyType(tpe)}", Set.empty)
    case CreateStageRe(stage) =>
      require(!stages.contains(stage), s"stage already exists: $stage")
      stages(stage) = Vector.empty
    case PutRe(path, stage) =>
      require(stages.contains(stage), s"PUT to unknown stage: $stage")
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
      stages(stage) = parseCsv(text).drop(1) // skip_header = 1
    case MergeRe(schema, table, projection, stage, pk, _assigns, insertCols, insertVals) =>
      val rows = stages.getOrElse(stage,
        throw new IllegalArgumentException(s"MERGE from unknown stage: $stage"))
      val names = projection.split(", ").toVector.map { p =>
        val m = """\$(\d+) (\w+)""".r.findFirstMatchIn(p.trim)
          .getOrElse(throw new IllegalArgumentException(s"bad positional alias: $p"))
        (m.group(1).toInt, m.group(2))
      }.sortBy(_._1).map(_._2)
      require(names == insertCols.split(", ").toVector,
        "INSERT column list must match the stage projection")
      val jsonCols = """parse_json\(src\.(\w+)\)""".r
        .findAllMatchIn(insertVals).map(_.group(1)).toSet
      mergeRows(schema, table, names, jsonCols, pk, rows)
    case DropStageRe(stage) =>
      stages.remove(stage); ()
    case other =>
      throw new IllegalArgumentException(
        s"statement outside the snowflake export protocol: ${other.take(120)}")
  }

  /** RFC-4180 parse with `renderCsv`'s conventions: `"`-enclosed cells with
    * doubled-quote escapes (newlines legal inside), empty UNQUOTED cell is
    * NULL, quoted empty cell is the empty string. */
  private[sinks] def parseCsv(text: String): Vector[Vector[Option[String]]] = {
    val rows = Vector.newBuilder[Vector[Option[String]]]
    var row = Vector.empty[Option[String]]
    val cell = new StringBuilder
    var quoted = false   // current cell was opened with a quote
    var inQuotes = false // currently inside the quoted region
    var i = 0
    def endCell(): Unit = {
      row :+= (if (!quoted && cell.isEmpty) None else Some(cell.toString))
      cell.clear(); quoted = false
    }
    def endRow(): Unit = { endCell(); rows += row; row = Vector.empty }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') { cell += '"'; i += 1 }
          else inQuotes = false
        } else cell += c
      } else c match {
        case '"' if cell.isEmpty && !quoted => quoted = true; inQuotes = true
        case ',' => endCell()
        case '\n' => endRow()
        case '\r' => () // tolerate CRLF
        case ch => cell += ch
      }
      i += 1
    }
    if (cell.nonEmpty || quoted || row.nonEmpty) endRow()
    rows.result()
  }

  /** MERGE semantics: delete matched pks + insert all staged rows, one
    * transaction (row-equivalent to update-matched + insert-unmatched with a
    * full column list — the same equivalence [[JdbcPageSink.Derby]] uses). */
  private def mergeRows(schema: String, table: String, names: Vector[String],
                        jsonCols: Set[String], pk: String,
                        rows: Vector[Vector[Option[String]]]): Unit = {
    require(rows.forall(_.length == names.length),
      s"staged rows have ${rows.headOption.fold(0)(_.length)} cells, expected ${names.length}")
    // Snowflake rejects a MERGE whose source matches one target row more
    // than once ("nondeterministic merge"); a staged page with duplicate
    // pks must fail here too, not silently land both rows
    locally {
      val pkIdx0 = names.indexOf(pk)
      require(pkIdx0 >= 0, s"pk $pk not in stage projection")
      val pks = rows.map(_(pkIdx0))
      require(pks.distinct.length == pks.length,
        s"nondeterministic merge: staged page contains duplicate $pk values")
    }
    val types: Map[String, String] = {
      val rs = conn.getMetaData.getColumns(null, schema.toUpperCase, table.toUpperCase, null)
      val m = mutable.Map[String, String]()
      while (rs.next()) m(rs.getString("COLUMN_NAME").toLowerCase) = rs.getString("TYPE_NAME")
      rs.close()
      m.toMap
    }
    names.foreach(n => require(types.contains(n.toLowerCase), s"unknown target column: $n"))
    val pkIdx = names.indexOf(pk)
    require(pkIdx >= 0, s"pk $pk not in stage projection")
    val autoCommit = conn.getAutoCommit
    conn.setAutoCommit(false)
    try {
      val del = conn.prepareStatement(s"DELETE FROM ${qi(schema)}.${qi(table)} WHERE ${qi(pk)} = ?")
      try {
        rows.foreach { r =>
          del.setObject(1, coerce(r(pkIdx), types(pk.toLowerCase), isJson = false))
          del.addBatch()
        }
        del.executeBatch()
      } finally del.close()
      val ins = conn.prepareStatement(
        s"INSERT INTO ${qi(schema)}.${qi(table)} (${names.map(qi).mkString(", ")}) VALUES (${names.map(_ => "?").mkString(", ")})")
      try {
        rows.foreach { r =>
          names.indices.foreach { i =>
            val tpe = types(names(i).toLowerCase)
            val v = coerce(r(i), tpe, jsonCols.contains(names(i)))
            if (v == null) ins.setNull(i + 1, jdbcTypeCode(tpe))
            else ins.setObject(i + 1, v)
          }
          ins.addBatch()
        }
        ins.executeBatch()
      } finally ins.close()
      conn.commit()
    } catch {
      case e: Throwable => conn.rollback(); throw e
    } finally conn.setAutoCommit(autoCommit)
  }

  private def jdbcTypeCode(derbyTypeName: String): Int = derbyTypeName match {
    case "BIGINT" => java.sql.Types.BIGINT
    case "INTEGER" => java.sql.Types.INTEGER
    case "DOUBLE" => java.sql.Types.DOUBLE
    case "BOOLEAN" => java.sql.Types.BOOLEAN
    case "TIMESTAMP" => java.sql.Types.TIMESTAMP
    case "DATE" => java.sql.Types.DATE
    case "DECIMAL" => java.sql.Types.DECIMAL
    case _ => java.sql.Types.VARCHAR
  }

  /** CSV text -> JDBC value for the target column's Derby type; `parse_json`
    * columns are validated as JSON first, like the warehouse would. */
  private def coerce(cell: Option[String], derbyType: String, isJson: Boolean): AnyRef =
    cell match {
      case None => null
      case Some(s) =>
        if (isJson) requireJson(s)
        derbyType match {
          case "BIGINT" => java.lang.Long.valueOf(s)
          case "INTEGER" => java.lang.Integer.valueOf(s)
          case "DOUBLE" => java.lang.Double.valueOf(s)
          case "BOOLEAN" => java.lang.Boolean.valueOf(s)
          case "TIMESTAMP" => java.sql.Timestamp.valueOf(s)
          case "DATE" => java.sql.Date.valueOf(s)
          case "DECIMAL" => new java.math.BigDecimal(s)
          case _ => s
        }
    }

  /** Minimal JSON well-formedness check (structure, strings, escapes,
    * numbers) — what `parse_json` enforces before a cell can land. */
  private def requireJson(s: String): Unit = {
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"parse_json: $msg at $i in: ${s.take(80)}")
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit =
      if (i < s.length && s.charAt(i) == c) i += 1 else fail(s"expected '$c'")
    def string(): Unit = {
      expect('"')
      while (i < s.length && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          i += 1
          if (i >= s.length) fail("dangling escape")
          if (s.charAt(i) == 'u') {
            if (i + 4 >= s.length || !(1 to 4).forall(k =>
              Character.digit(s.charAt(i + k), 16) >= 0)) fail("bad \\u escape")
            i += 4
          } else if (!"\"\\/bfnrt".contains(s.charAt(i))) fail("bad escape")
        }
        i += 1
      }
      expect('"')
    }
    def number(): Unit = {
      if (i < s.length && s.charAt(i) == '-') i += 1
      if (i >= s.length || !s.charAt(i).isDigit) fail("bad number")
      while (i < s.length && (s.charAt(i).isDigit || ".eE+-".contains(s.charAt(i)))) i += 1
    }
    def value(): Unit = {
      ws()
      if (i >= s.length) fail("empty value")
      s.charAt(i) match {
        case '{' =>
          i += 1; ws()
          if (i < s.length && s.charAt(i) == '}') i += 1
          else {
            var more = true
            while (more) {
              ws(); string(); ws(); expect(':'); value(); ws()
              if (i < s.length && s.charAt(i) == ',') i += 1 else more = false
            }
            expect('}')
          }
        case '[' =>
          i += 1; ws()
          if (i < s.length && s.charAt(i) == ']') i += 1
          else {
            var more = true
            while (more) {
              value(); ws()
              if (i < s.length && s.charAt(i) == ',') i += 1 else more = false
            }
            expect(']')
          }
        case '"' => string()
        case 't' => if (s.startsWith("true", i)) i += 4 else fail("bad literal")
        case 'f' => if (s.startsWith("false", i)) i += 5 else fail("bad literal")
        case 'n' => if (s.startsWith("null", i)) i += 4 else fail("bad literal")
        case _ => number()
      }
      ws()
    }
    value()
    if (i != s.length) fail("trailing content")
  }
}

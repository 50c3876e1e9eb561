package graft.sinks

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** K2 — the Snowflake warehouse dialect (`db_adapter/snowflake.rb:34-146`):
  * the staged-merge protocol re-expressed in the statement forms Snowflake
  * actually accepts. The shapes that differ from Postgres:
  *
  *  - no indices at all (`snowflake.rb:30-32` raises);
  *  - no `ADD COLUMN IF NOT EXISTS` — the conditional is an `EXECUTE
  *    IMMEDIATE` block probing `INFORMATION_SCHEMA.COLUMNS` with `ILIKE`
  *    (Snowflake uppercases stored identifiers, `snowflake.rb:56-79`);
  *  - page loads go file -> named stage -> `MERGE INTO` reading the stage
  *    with positional `$1..$n` columns, JSON (`OBJECT`) columns wrapped in
  *    `parse_json` on both the USING projection and the INSERT values
  *    (`snowflake.rb:81-146`).
  *
  * The container has no warehouse, so the statement sequence is the tested
  * unit (golden spec), exactly like [[DbMergeExport]]'s Postgres forms; the
  * reference itself executes these via an external CLI session, so the
  * generator IS the adapter's engine-side content.
  */
object SnowflakeExport {

  private def q(ident: String): String = {
    require(ident.matches("[A-Za-z_][A-Za-z0-9_]{0,62}"), s"invalid identifier: $ident")
    ident
  }

  /** `COLTYPE_MAP` (`snowflake.rb:136-146`); composite Spark types land as
    * Snowflake OBJECT and get `parse_json` handling in the merge. */
  def sqlType(dt: DataType): String = dt.typeName match {
    case "string" => "text"
    case "long" => "bigint"
    case "integer" => "integer"
    case "double" => "double precision"
    case "float" => "float"
    case "boolean" => "boolean"
    case "timestamp" => "timestamptz"
    case "date" => "date"
    case t if t.startsWith("decimal") => "numeric"
    case _ => "object" // map/struct/array/json payloads
  }

  def isObjectType(dt: DataType): Boolean = sqlType(dt) == "object"

  /** Snowflake has no indices — mirror the reference's hard refusal
    * (`snowflake.rb:30-32`) rather than silently no-oping. */
  def createIndexSql(table: String): Nothing =
    throw new UnsupportedOperationException(
      s"Snowflake does not support indices (requested for $table)")

  /** Multi-line CREATE TABLE (`snowflake.rb:34-44`). */
  def createTableSql(schema: String, table: String, st: StructType,
                     ifNotExists: Boolean = false): String = {
    val head = "CREATE TABLE " + (if (ifNotExists) "IF NOT EXISTS " else "") +
      s"${q(schema)}.${q(table)}"
    val cols = st.fields.map(f => s"  ${q(f.name)} ${sqlType(f.dataType)}")
    (s"$head (" +: cols.init.map(_ + ",") :+ cols.last :+ ")").mkString("\n")
  }

  /** Conditional ADD COLUMN (`snowflake.rb:56-79`): Snowflake lacks
    * `ADD COLUMN IF NOT EXISTS`, so the existence probe is an `EXECUTE
    * IMMEDIATE` block over `INFORMATION_SCHEMA.COLUMNS`. `ILIKE` because
    * Snowflake stores identifiers uppercased. */
  def addColumnSql(schema: String, table: String, field: StructField,
                   ifNotExists: Boolean = false): String = {
    val add = s"ALTER TABLE ${q(schema)}.${q(table)} ADD COLUMN ${q(field.name)} ${sqlType(field.dataType)}"
    if (!ifNotExists) add
    else
      s"""EXECUTE IMMEDIATE $$$$
         |BEGIN
         |  IF (NOT EXISTS(
         |    SELECT * FROM INFORMATION_SCHEMA.COLUMNS
         |    WHERE TABLE_SCHEMA ILIKE '${q(schema)}'
         |      AND TABLE_NAME ILIKE '${q(table)}'
         |      AND COLUMN_NAME ILIKE '${q(field.name)}'
         |  )) THEN
         |    $add;
         |  END IF;
         |END;
         |$$$$""".stripMargin
  }

  /** Idempotent schema-sync sequence, the Snowflake spelling of
    * [[DbMergeExport.ensureSchemaDdl]]. */
  def ensureSchemaDdl(schema: String, table: String, st: StructType): Seq[String] =
    Seq(s"CREATE SCHEMA IF NOT EXISTS ${q(schema)}",
        createTableSql(schema, table, st, ifNotExists = true)) ++
      st.fields.map(f => addColumnSql(schema, table, f, ifNotExists = true))

  /** The stage-based merge (`snowflake.rb:81-126`): CREATE STAGE with the
    * CSV file format (ENCLOSED_BY is what keeps JSON cells intact), PUT the
    * local file, then one MERGE INTO whose USING reads the stage with
    * positional `$1..$n` columns; OBJECT columns are `parse_json`ed in both
    * the update assignments and the insert values. `stageSuffix` replaces
    * the reference's random hex so runs are deterministic and testable —
    * callers pass a per-page unique token. */
  def mergeFromStageStatements(schema: String, table: String, st: StructType,
                               pkCol: String, filePath: String,
                               stageSuffix: String): Seq[String] = {
    require(st.fieldNames.contains(pkCol), s"missing pk column $pkCol")
    val qtable = s"${q(schema)}.${q(table)}"
    val stage = s"${q(schema)}.${q(s"graft_tempstage_${stageSuffix}_$table")}"
    val names = st.fields.map(f => q(f.name))
    val placeholders = names.zipWithIndex.map { case (n, i) => s"$$${i + 1} $n" }
    val srcExpr = st.fields.map(f =>
      if (isObjectType(f.dataType)) s"parse_json(src.${q(f.name)})" else s"src.${q(f.name)}")
    val assigns = st.fields.filterNot(_.name == pkCol).map(f =>
      if (isObjectType(f.dataType)) s"${q(f.name)} = parse_json(src.${q(f.name)})"
      else s"${q(f.name)} = src.${q(f.name)}")
    Seq(
      s"""CREATE STAGE $stage FILE_FORMAT = (type = 'CSV' skip_header = 1 FIELD_OPTIONALLY_ENCLOSED_BY = '"')""",
      s"PUT file://$filePath @$stage auto_compress=true",
      s"""MERGE INTO $qtable AS tgt
         |  USING (
         |    SELECT ${placeholders.mkString(", ")} FROM @$stage
         |  ) src
         |  ON tgt.${q(pkCol)} = src.${q(pkCol)}
         |  WHEN MATCHED THEN UPDATE SET ${assigns.mkString(", ")}
         |  WHEN NOT MATCHED THEN INSERT (${names.mkString(", ")}) VALUES (${srcExpr.mkString(", ")})""".stripMargin,
      s"DROP STAGE IF EXISTS $stage")
  }

  /** CSV page render for the staged file: header row + RFC-4180 quoting
    * (the `skip_header = 1` + ENCLOSED_BY format above). Null -> empty
    * unquoted cell, the loader's NULL convention. */
  def renderCsv(st: StructType, page: Seq[Row]): String = {
    def quote(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""
    // OBJECT-typed cells must land as JSON text (quoted like any string
    // cell) or the parse_json in the MERGE projection has nothing valid to
    // parse — and a raw toString would smuggle commas into the CSV row.
    def json(v: Any): String = v match {
      case null => "null"
      case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""
      case m: scala.collection.Map[_, _] =>
        m.map { case (k, x) => s"${json(k.toString)}:${json(x)}" }.mkString("{", ",", "}")
      case seq: scala.collection.Seq[_] => seq.map(json).mkString("[", ",", "]")
      case r: Row => r.schema.fieldNames.zip(r.toSeq)
        .map { case (k, x) => s"${json(k)}:${json(x)}" }.mkString("{", ",", "}")
      case b: Boolean => b.toString
      case n => n.toString
    }
    def cell(v: Any, dt: DataType): String = v match {
      case null => ""
      case _ if isObjectType(dt) => quote(json(v))
      case s: String => quote(s)
      case other => other.toString
    }
    (st.fieldNames.mkString(",") +:
      page.map(r => st.fields.indices.map(i =>
        cell(r.get(i), st.fields(i).dataType)).mkString(","))).mkString("\n") + "\n"
  }

  /** A [[SyncTarget.PageSink]] that drives the full Snowflake protocol
    * around a pluggable statement executor (the reference runs these through
    * an external CLI session — `snowflake.rb:10-26` — so the executor is the
    * I/O seam): per page, render CSV to a spool file, then hand the
    * ensure-schema (first page only) + stage/PUT/MERGE sequence to `run`. */
  final class Sink(schema: String, table: String, st: StructType, pkCol: String,
                   spoolDir: java.nio.file.Path, run: String => Unit)
      extends SyncTarget.PageSink {
    private var ensured = false
    def writePage(page: Seq[Row], pageIdx: Long): Unit = {
      if (page.isEmpty) return
      if (!ensured) { ensureSchemaDdl(schema, table, st).foreach(run); ensured = true }
      val file = spoolDir.resolve(s"${table}_page_$pageIdx.csv")
      java.nio.file.Files.write(file,
        renderCsv(st, page).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      mergeFromStageStatements(schema, table, st, pkCol,
        file.toAbsolutePath.toString, s"p$pageIdx").foreach(run)
    }
  }
}

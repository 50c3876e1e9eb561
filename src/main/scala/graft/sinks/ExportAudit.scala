package graft.sinks

import graft.plans.{ColumnLineage, ReadonlyGuard, SavedQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The lineage<->sync-target integration: one registry answering "which
  * EXPORTS ship values derived from column X" in one call — the PII /
  * schema-migration review the reference implements with per-org database
  * grants (`organization/db_builder.rb:326-356` credential scoping),
  * answered here at the PLAN level via [[ColumnLineage]], so it covers
  * derived values (a hash of an email, a concat embedding a name), not
  * just direct column grants.
  *
  * Every outbound surface registers the frame (or saved-query id) it
  * exports under its target id — the DB sync target's staged-merge table
  * ([[DbMergeExport]]), the HTTP page sink's payload ([[SyncTarget]]
  * pagination), warehouse exports, per-row notify payloads. Analysis
  * only: nothing here runs a query — lineage is computed from the
  * ANALYZED plan at audit time, so the audit is safe to run against
  * production registrations.
  *
  * Scale: registrations are metadata (a plan thunk each); an audit walks
  * each registered plan once on the driver — O(registered exports x plan
  * size), no cluster work. */
final class ExportAudit(spark: SparkSession, saved: Option[SavedQueries] = None) {

  /** A registered export: how the rows leave (kind) and the plan that
    * produces them. The thunk re-derives the frame at audit time so the
    * audit sees the CURRENT saved-query text / view definition, not a
    * snapshot from registration day. */
  private final case class Export(kind: String, frame: () => DataFrame)

  private val store = scala.collection.concurrent.TrieMap.empty[String, Export]

  /** Register a sync target exporting `df` (by-name: re-evaluated per
    * audit). `kind` is the outbound surface: "db", "http", "warehouse",
    * "notify", ... */
  def register(targetId: String, kind: String, df: => DataFrame): Unit =
    store.put(targetId, Export(kind, () => df))

  /** Register a target exporting read-only SQL (validated now, analyzed
    * per audit). */
  def registerSql(targetId: String, kind: String, sql: String): Unit = {
    ReadonlyGuard.validate(spark, sql)
    store.put(targetId, Export(kind, () => spark.sql(sql)))
  }

  /** Register a target exporting a saved query by id — the frame resolves
    * through the SavedQueries store at audit time, so re-saving the query
    * re-points the audit automatically. */
  def registerSavedQuery(targetId: String, kind: String, savedId: String): Unit = {
    val sq = saved.getOrElse(throw new IllegalStateException(
      "registerSavedQuery requires an ExportAudit constructed with a SavedQueries store"))
    store.put(targetId, Export(kind, () => spark.sql(sq.sql(savedId).getOrElse(
      throw new NoSuchElementException(s"no saved query $savedId")))))
  }

  def unregister(targetId: String): Unit = { store.remove(targetId); () }

  def lineage(targetId: String): Map[String, Set[ColumnLineage.SourceColumn]] =
    ColumnLineage.lineage(store.getOrElse(targetId,
      throw new NoSuchElementException(s"no export $targetId")).frame())

  /** One affected export: which of its OUTPUT columns carry values derived
    * from the audited source column. */
  final case class Touch(targetId: String, kind: String, columns: Seq[String])

  /** THE audit entry point: every registered export shipping values
    * derived from `table`.`column`, with the output columns that carry
    * them. Empty means a migration/redaction of that column is invisible
    * to every outbound surface. */
  def exportsTouching(table: String, column: String): Seq[Touch] =
    store.toSeq.sortBy(_._1).flatMap { case (id, ex) =>
      val cols = ColumnLineage.lineage(ex.frame()).collect {
        case (out, srcs) if srcs.exists(s => s.table == table && s.column == column) => out
      }.toSeq.sorted
      if (cols.nonEmpty) Some(Touch(id, ex.kind, cols)) else None
    }

  /** The review report: one line per affected export. */
  def renderTouching(table: String, column: String): String = {
    val ts = exportsTouching(table, column)
    if (ts.isEmpty) s"no export ships values derived from $table.$column"
    else ts.map(t => s"${t.targetId} (${t.kind}): ${t.columns.mkString(", ")}")
      .mkString("\n")
  }
}

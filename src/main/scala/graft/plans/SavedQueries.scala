package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Saved queries and saved views (K6, `lib/webhookdb/saved_query.rb:3-29`,
  * `saved_view.rb:20-52`): server-stored SQL runnable by opaque id, and
  * validated read-only SQL materialized as catalog views.
  */
final class SavedQueries(spark: SparkSession) {

  private final case class Saved(sql: String, isPublic: Boolean)
  private val store = scala.collection.concurrent.TrieMap.empty[String, Saved]

  /** Validate (read-only parse walk, no execution) and store under an
    * opaque id. `isPublic` marks the query runnable through the public
    * token path (`saved_query.rb:12-16`, `api/saved_queries.rb:208`). */
  def save(id: String, sql: String, isPublic: Boolean = false): Unit = {
    ReadonlyGuard.validate(spark, sql)
    store.put(id, Saved(sql, isPublic))
  }

  def sql(id: String): Option[String] = store.get(id).map(_.sql)

  /** Column lineage of a saved query WITHOUT running it (analysis only):
    * which physical source columns feed each output column — the audit an
    * admin runs over every saved query before a schema migration or PII
    * review ([[ColumnLineage]]). */
  def lineage(id: String): Map[String, Set[ColumnLineage.SourceColumn]] = {
    val q = store.getOrElse(id, throw new NoSuchElementException(s"no saved query $id"))
    ColumnLineage.lineage(spark.sql(q.sql))
  }

  def setPublic(id: String, isPublic: Boolean): Unit =
    store.updateWith(id)(_.map(_.copy(isPublic = isPublic)))

  /** Run a saved query by id under the read-only guard + row cap. */
  def run(id: String, maxRows: Int = ReadonlyGuard.DefaultMaxRows): ReadonlyGuard.QueryResult = {
    val q = store.getOrElse(id, throw new NoSuchElementException(s"no saved query $id"))
    ReadonlyGuard.run(spark, q.sql, maxRows)
  }

  /** Run a saved query through the RESULT cache: repeated dashboard reads
    * of an unchanged query over unchanged data serve the materialized
    * parquet result (version-aware key — any input-data change moves it,
    * see [[ResultCache]]) instead of re-running the plan. The read-only
    * guard's validation and row cap still apply on every call. Queries
    * the cache must REFUSE (a non-file-backed leaf, e.g. a temp view
    * over in-memory data, whose bytes the key cannot see) fall back to
    * the direct guarded run: caching is an optimization, never a gate.
    *
    * What gets materialized is the CAPPED frame (`LIMIT maxRows + 1` —
    * the same rows the uncached run() collects, +1 being the truncation
    * sentinel), never the full result: a saved query with a corpus-sized
    * result costs the cache maxRows+1 rows of disk and execution, not
    * the corpus. The limit is part of the cache key, so different row
    * budgets cache separately; like run(), an un-ORDERed query's capped
    * subset is engine-chosen (the cache just makes one choice sticky). */
  def runCached(id: String, cache: ResultCache,
                maxRows: Int = ReadonlyGuard.DefaultMaxRows): ReadonlyGuard.QueryResult = {
    val q = store.getOrElse(id, throw new NoSuchElementException(s"no saved query $id"))
    ReadonlyGuard.validate(spark, q.sql)
    val df = spark.sql(q.sql).limit(maxRows + 1)
    val served = try cache.run(df)
      catch { case _: IllegalArgumentException => df }
    ReadonlyGuard.cap(spark, served, maxRows)
  }

  /** The public-token run path: only queries explicitly marked public are
    * runnable without org auth; everything else is invisible (NoSuchElement,
    * not a permission error — ids are opaque). */
  def runPublic(id: String, maxRows: Int = ReadonlyGuard.DefaultMaxRows): ReadonlyGuard.QueryResult = {
    val q = store.get(id).filter(_.isPublic)
      .getOrElse(throw new NoSuchElementException(s"no saved query $id"))
    ReadonlyGuard.run(spark, q.sql, maxRows)
  }

  /** Saved view: validated read-only SQL -> CREATE OR REPLACE (temp) VIEW. */
  def createOrReplaceView(name: String, sql: String): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]{0,62}"),
      s"invalid view identifier: $name") // db_adapter.rb:10-22 validation
    ReadonlyGuard.validate(spark, sql)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name AS $sql")
  }

  def runView(name: String): DataFrame = spark.table(name)

  /** The `db tables` listing (`api/db.rb:76-88`): user-visible tables/views
    * in the session catalog. */
  def listTables(): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq.sorted
}

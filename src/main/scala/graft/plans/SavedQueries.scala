package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Saved queries and saved views (K6, `lib/webhookdb/saved_query.rb:3-29`,
  * `saved_view.rb:20-52`): server-stored SQL runnable by opaque id, and
  * validated read-only SQL materialized as catalog views.
  */
final class SavedQueries(spark: SparkSession) {

  private val store = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Validate (read-only parse walk, no execution) and store under an
    * opaque id. */
  def save(id: String, sql: String): Unit = {
    ReadonlyGuard.validate(spark, sql)
    store.put(id, sql)
  }

  def sql(id: String): Option[String] = store.get(id)

  /** Run a saved query by id under the read-only guard + row cap. */
  def run(id: String, maxRows: Int = ReadonlyGuard.DefaultMaxRows): ReadonlyGuard.QueryResult = {
    val q = store.getOrElse(id, throw new NoSuchElementException(s"no saved query $id"))
    ReadonlyGuard.run(spark, q, maxRows)
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

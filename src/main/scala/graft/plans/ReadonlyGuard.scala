package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, LogicalPlan}

/** The arbitrary-SQL query surface with the reference's safety envelope
  * (§3.3): SELECT-only enforcement, row cap with `max_rows_reached`
  * (`organization.rb:23,146-164` — 1000 rows default, readonly role).
  *
  * The reference delegates safety to a Postgres readonly role; a single-user
  * Spark session has no such backstop, so the guard inspects the PARSED plan
  * before analysis: any command node (DDL/DML/SET/...) or insert is rejected.
  * Plan-level, not regex-level — CTEs, subqueries, EXPLAIN tricks all resolve
  * to plan nodes.
  */
object ReadonlyGuard {

  final case class QueryResult(df: DataFrame, maxRowsReached: Boolean) {
    def headers: Seq[String] = df.columns.toSeq
  }

  final class RejectedSql(msg: String) extends RuntimeException(msg)

  val DefaultMaxRows = 1000

  private def offendingNode(plan: LogicalPlan): Option[String] = {
    val bad = plan.collectFirst {
      case c: Command => c.nodeName
      case i: InsertIntoStatement => i.nodeName
    }
    bad.orElse {
      // catch parsed-but-not-yet-Command statements (CreateTableStatement etc.)
      plan.collectFirst {
        case n if n.nodeName.endsWith("Statement") &&
          !n.nodeName.startsWith("Select") => n.nodeName
      }
    }
  }

  /** Parse and reject non-read-only SQL without executing anything. */
  def validate(spark: SparkSession, sql: String): Unit = {
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    offendingNode(parsed).foreach { node =>
      throw new RejectedSql(
        s"only read-only queries are allowed; rejected plan node: $node")
    }
  }

  /** Parse, reject non-queries, run with a row cap. Mirrors
    * `execute_readonly_query_with_help`: returns the capped rows plus whether
    * the cap was hit. */
  def run(spark: SparkSession, sql: String,
          maxRows: Int = DefaultMaxRows): QueryResult = {
    validate(spark, sql)
    val df = spark.sql(sql)
    val capped = df.limit(maxRows + 1).collect()
    val reached = capped.length > maxRows
    val rows = if (reached) capped.take(maxRows) else capped
    QueryResult(spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), df.schema), reached)
  }
}

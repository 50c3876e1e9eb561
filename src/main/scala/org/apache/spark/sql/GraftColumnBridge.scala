package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Interop shim: Spark 4 made Column<->Expression conversion `private[sql]`
  * (`classic.ExpressionUtils`); extension libraries that define native
  * Catalyst expressions need this bridge to expose them as Columns.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `Dataset.ofRows` went `private[sql]` too; the scan-budget estimator
    * (graft.plans.ReadonlyGuard) needs to PLAN a subquery's logical plan
    * without executing it — physical file-scan listings live one planning
    * step below where `PlanExpression` hands out logical plans. */
  def ofRows(spark: SparkSession,
             plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

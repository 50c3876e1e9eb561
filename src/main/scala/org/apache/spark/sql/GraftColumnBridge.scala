package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Interop shim: Spark 4 made Column<->Expression conversion `private[sql]`
  * (`classic.ExpressionUtils`); extension libraries that define native
  * Catalyst expressions need this bridge to expose them as Columns.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

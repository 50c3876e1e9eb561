package graft.plans

import graft.functions.expressions.Str2IntHash
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.StringType

/** Session-extension entry point: install the engine's native functions at
  * session build time via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (the injection path
  * for clusters where the session is constructed by infrastructure, not
  * application code; `GraftFunctions.register` is the equivalent for an
  * already-built session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def build(exprs: Seq[Expression]): Expression = {
    if (exprs.size != 1)
      throw new IllegalArgumentException(
        s"str2inthash takes exactly 1 argument, got ${exprs.size}")
    Str2IntHash(Coalesce(Seq(
      Cast(exprs.head, StringType), Literal.create("", StringType))))
  }

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("str2inthash"),
      new ExpressionInfo(classOf[Str2IntHash].getName, "str2inthash"),
      build _))
    extensions.injectOptimizerRule(_ => new RangeJoinRewrite)
    extensions.injectOptimizerRule(_ => new BoundedEditDistanceRewrite)
  }
}

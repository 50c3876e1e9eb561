package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen vector kernels over quantized (Long-array) embeddings —
  * the hot inner loop of every similarity query (q30/q31/q37/q39). The
  * composed-Column forms (`zip_with` + `aggregate`) evaluate an interpreted
  * lambda PER ELEMENT per pair; these expressions run the whole k-element
  * loop in one static call inside whole-stage codegen.
  *
  * Semantics match the composed forms exactly, including the null contract:
  * null if either array is null OR the lengths differ (`zip_with` pads the
  * shorter side with nulls, which poisons the interpreted sum to null).
  */
abstract class VecBinaryLong extends BinaryExpression {
  override def dataType: DataType = LongType

  /** The static kernel call target, e.g.
    * "graft.functions.expressions.VectorOps.dot". */
  protected def kernel: String

  protected def compute(a: ArrayData, b: ArrayData): Long

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else java.lang.Long.valueOf(compute(x, y))
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $kernel($a, $b);
         |}
       """.stripMargin)
}

/** Integer dot product of two Long arrays. */
case class DotLong(left: Expression, right: Expression) extends VecBinaryLong {
  protected val kernel = "graft.functions.expressions.VectorOps.dot"
  protected def compute(a: ArrayData, b: ArrayData): Long = VectorOps.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotLong =
    copy(left = l, right = r)
  override def prettyName: String = "dot_long"
}

/** Integer squared L2 distance of two Long arrays. */
case class L2SqLong(left: Expression, right: Expression) extends VecBinaryLong {
  protected val kernel = "graft.functions.expressions.VectorOps.l2sq"
  protected def compute(a: ArrayData, b: ArrayData): Long = VectorOps.l2sq(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2SqLong =
    copy(left = l, right = r)
  override def prettyName: String = "l2sq_long"
}

object VectorOps {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  def l2sq(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { val d = a.getLong(i) - b.getLong(i); acc += d * d; i += 1 }
    acc
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def dotLong(a: Column, b: Column): Column =
    column(DotLong(expression(a), expression(b)))

  def l2SqLong(a: Column, b: Column): Column =
    column(L2SqLong(expression(a), expression(b)))
}

package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native SimHash over a shingle-hash array — the codegen replacement for
  * the composed-Column form in `Hashing.simhash`, which needs one
  * interpreted `aggregate` lambda pass over the array PER BIT (32 passes).
  * This expression computes every bit vote in a single traversal and
  * `doGenCode` emits a static call inside whole-stage codegen.
  *
  * Bit-for-bit identical to the Column form (and to the DuckDB oracle):
  * bit b of the fingerprint is set iff
  * `sum over s of ((s>>b)&1)*2-1` is positive.
  */
case class SimHash32(child: Expression, bits: Int) extends UnaryExpression {
  require(bits > 0 && bits <= 32, "bits must be in 1..32")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(SimHash32.hash(v.asInstanceOf[ArrayData], bits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.SimHash32.hash($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)

  override def prettyName: String = "simhash32"
}

object SimHash32 {

  /** One pass: accumulate per-bit counts of set bits, then majority-vote.
    * `votes[b] > n/2` <=> `sum(((s>>b)&1)*2-1) > 0` for n elements...
    * strictly: sum = 2*setCount - n, positive iff 2*setCount > n. */
  def hash(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    val set = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val s = arr.getLong(i)
      var b = 0
      while (b < bits) {
        set(b) += ((s >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (2L * set(b) > n) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column API (null array -> null, matching the Column-form semantics). */
  def simhash(arr: Column, bits: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(SimHash32(GraftColumnBridge.expression(arr), bits))
  }
}

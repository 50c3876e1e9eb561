package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature — the codegen replacement for the composed
  * form in `Hashing.minhashSignature`, which materializes one transformed
  * array + array_min per permutation (k interpreted passes). One traversal
  * computes all k minima; `doGenCode` emits a static call inside
  * whole-stage codegen. Values are identical: min over s of
  * `(s*A_i + B_i) mod P` per permutation i.
  */
case class MinhashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k <= graft.functions.Hashing.MinhashA.size)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    MinhashSig.signature(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.MinhashSig.signature($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinhashSig {

  private val P = graft.functions.Hashing.P
  private val A = graft.functions.Hashing.MinhashA.toArray
  private val B = graft.functions.Hashing.MinhashB.toArray

  /** One pass over the shingle array, all k permutation minima. Empty
    * arrays yield Long.MaxValue minima — same as array_min over an empty
    * transform (null) would NOT be; shingle arrays are non-empty by
    * construction (degenerate docs fall back to the whole-doc hash). */
  def signature(arr: ArrayData, k: Int): GenericArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getLong(i)
      var j = 0
      while (j < k) {
        val h = (s * A(j) + B(j)) % P
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column API (null array -> null). */
  def minhash(arr: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(MinhashSig(GraftColumnBridge.expression(arr), k))
  }
}

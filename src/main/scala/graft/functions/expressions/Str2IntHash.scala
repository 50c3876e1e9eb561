package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's stable partition hash
  * (E7, `partitionable_mixin.rb:74-90`): hex chars 2..9 of `md5(s)` parsed
  * unsigned, minus 2^31.
  *
  * Semantically identical to the composed-Column form in
  * `Converters.str2inthash` (same golden vectors) but the digest runs off
  * raw bytes without materializing a hex string or a conv() parse, and
  * `doGenCode` emits a direct static call inside whole-stage codegen — the
  * preferred shape for a hot partition-key expression (SURVEY §4 named this
  * the one worthwhile custom-Expression candidate).
  *
  * Null handling follows the usual expression contract (null in, null out);
  * the public wrapper coalesces to "" first, matching the reference's
  * null golden vector.
  */
case class Str2IntHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(v: Any): Any =
    Integer.valueOf(Str2IntHash.hash(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.Str2IntHash.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): Str2IntHash =
    copy(child = newChild)

  override def prettyName: String = "str2inthash"
}

object Str2IntHash {

  private val digests = ThreadLocal.withInitial(() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** The hash kernel — shared by interpreted eval and generated code
    * (called via the companion's static forwarder). */
  def hash(s: UTF8String): Int = {
    val md = digests.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    // hex chars 2..9 of the digest = 32 bits starting at nibble index 1
    val unsigned =
      ((digest(0) & 0x0FL) << 28) |
        ((digest(1) & 0xFFL) << 20) |
        ((digest(2) & 0xFFL) << 12) |
        ((digest(3) & 0xFFL) << 4) |
        ((digest(4) & 0xF0L) >>> 4)
    (unsigned - 2147483648L).toInt
  }

  /** Column API: null maps to hash("") per the reference's golden vectors. */
  def str2inthash(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.functions.{coalesce, lit}
    GraftColumnBridge.column(
      Str2IntHash(GraftColumnBridge.expression(coalesce(c.cast("string"), lit("")))))
  }
}

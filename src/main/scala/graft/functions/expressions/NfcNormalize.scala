package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the first
  * step of every text-corpus cleanup pass (decomposed accents, compatibility
  * variants arriving from heterogeneous crawls must collapse to one
  * canonical byte sequence before hashing/dedup, or identical documents
  * fingerprint differently).
  *
  * Spark has no built-in Unicode normalizer; a Scala UDF would leave
  * whole-stage codegen and pay serialization per row. This expression stays
  * inside codegen (`doGenCode` emits a static call) and short-circuits the
  * overwhelmingly common case: pure-ASCII strings are already NFC and are
  * returned without allocating (one byte scan, no String round-trip).
  *
  * Matches DuckDB's `nfc_normalize` (both implement Unicode canonical
  * composition), which is what lets the correctness oracle hash-compare
  * normalized output byte-for-byte.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  /** The kernel — shared by interpreted eval and generated code. ASCII
    * fast-path: NFC is the identity on ASCII, return the input as-is. */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      val normalized = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
      if (normalized eq str) s else UTF8String.fromString(normalized)
    }
  }

  /** Column API. */
  def nfcNormalize(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c.cast("string"))))
  }
}

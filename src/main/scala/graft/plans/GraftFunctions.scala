package graft.plans

import graft.functions.expressions.{NfcNormalize, Str2IntHash}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Coalesce, Cast, Literal}
import org.apache.spark.sql.types.StringType

/** SQL-surface registration of the engine's scalar functions, so users of
  * the read-only query surface (§3.3) can call them directly — the analog of
  * the reference's `pg_temp` helper functions (`column.rb:368-378`).
  */
object GraftFunctions {

  /** Register engine functions on a session. Currently:
    * `str2inthash(expr)` — the E7 partition hash as a native codegen'd
    * expression; `nfc_normalize(expr)` — Unicode NFC canonicalization. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "str2inthash",
      exprs => Str2IntHash(Coalesce(Seq(
        Cast(exprs.head, StringType), Literal.create("", StringType)))),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      exprs => NfcNormalize(Cast(exprs.head, StringType)),
      "scala_udf")
  }
}

package graft.plans

import graft.functions.expressions.{DotLong, HtmlExtract, L2SqLong, LevenshteinWithin, MinhashSig, NfcNormalize, SimHash32, Str2IntHash}
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
      exprs => {
        arity("str2inthash", exprs, min = 1, max = 1)
        Str2IntHash(Coalesce(Seq(
          Cast(exprs.head, StringType), Literal.create("", StringType))))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      exprs => {
        arity("nfc_normalize", exprs, min = 1, max = 1)
        NfcNormalize(Cast(exprs.head, StringType))
      },
      "scala_udf")
    // corpus sketch + vector kernels (all native codegen expressions):
    // graft_simhash(hash_array[, bits]), graft_minhash(hash_array, k),
    // graft_dot(a, b), graft_l2sq(a, b)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash",
      exprs => {
        arity("graft_simhash", exprs, min = 1, max = 2)
        SimHash32(exprs.head,
          exprs.lift(1).map(litInt(_, "graft_simhash bits")).getOrElse(32))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash",
      exprs => {
        arity("graft_minhash", exprs, min = 2, max = 2)
        MinhashSig(exprs.head, litInt(exprs(1), "graft_minhash k"))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => {
        arity("graft_dot", exprs, min = 2, max = 2)
        DotLong(exprs.head, exprs(1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_l2sq",
      exprs => {
        arity("graft_l2sq", exprs, min = 2, max = 2)
        L2SqLong(exprs.head, exprs(1))
      },
      "scala_udf")
    // levenshtein_within(a, b, k) -> exact edit distance when <= k, k+1
    // otherwise: the banded form the optimizer rule rewrites thresholded
    // levenshtein comparisons into, exposed directly for SQL users that
    // want the distance VALUE under a known radius
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "levenshtein_within",
      exprs => {
        arity("levenshtein_within", exprs, min = 3, max = 3)
        LevenshteinWithin(Cast(exprs.head, StringType),
          Cast(exprs(1), StringType), litInt(exprs(2), "levenshtein_within k"))
      },
      "scala_udf")
    // html_extract(html) -> struct(text, n_links, link_chars): the crawl
    // pipeline's boilerplate stripper, exposed on the SQL surface so a
    // saved query can run extraction without the Scala API
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "html_extract",
      exprs => {
        arity("html_extract", exprs, min = 1, max = 1)
        HtmlExtract(Cast(exprs.head, StringType))
      },
      "scala_udf")
  }

  private def arity(name: String,
                    exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                    min: Int, max: Int): Unit =
    if (exprs.size < min || exprs.size > max)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name,
          "expectedNum" -> (if (min == max) s"$min" else s"$min to $max"),
          "actualNum" -> exprs.size.toString,
          "docroot" -> ""))

  private def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression,
                     what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
}

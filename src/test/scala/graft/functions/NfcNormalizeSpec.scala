package graft.functions

import graft.SparkSpec
import graft.functions.expressions.NfcNormalize
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

/** NFC canonicalization: composes decomposed sequences, leaves NFC text
  * untouched (ASCII via the no-alloc fast path), agrees across codegen and
  * interpreted eval, and is callable from the SQL surface. */
class NfcNormalizeSpec extends SparkSpec {

  private val decomposed = "cafe\u0301 nai\u0308ve a\u0300"
  private val composed = "caf\u00e9 na\u00efve \u00e0"

  test("composes combining marks to precomposed forms") {
    import spark.implicits._
    val got = Seq(decomposed).toDF("s")
      .select(NfcNormalize.nfcNormalize(col("s"))).as[String].collect()(0)
    assert(got == composed)
  }

  test("identity on already-NFC text, including the ASCII fast path") {
    import spark.implicits._
    val inputs = Seq("plain ascii text", composed, "", "tabs\tand\nnewlines")
    val got = inputs.toDF("s")
      .select(NfcNormalize.nfcNormalize(col("s"))).as[String].collect()
    assert(got.toSeq == inputs)
  }

  test("null in, null out") {
    import spark.implicits._
    val got = Seq(Option.empty[String]).toDF("s")
      .select(NfcNormalize.nfcNormalize(col("s"))).collect()(0)
    assert(got.isNullAt(0))
  }

  test("interpreted eval path agrees with codegen") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      import spark.implicits._
      val got = Seq(decomposed, "ascii").toDF("s")
        .select(NfcNormalize.nfcNormalize(col("s"))).as[String].collect()
      assert(got.toSeq == Seq(composed, "ascii"))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("registered in the SQL surface") {
    GraftFunctions.register(spark)
    val r = spark.sql(s"SELECT nfc_normalize('$decomposed') AS n").collect()(0)
    assert(r.getString(0) == composed)
  }
}

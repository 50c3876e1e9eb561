package graft.functions

import graft.SparkSpec
import graft.functions.expressions.Str2IntHash
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

/** The native expression must match the composed-Column form on every
  * reference golden vector, under both codegen and interpreted eval, and be
  * callable from the SQL surface. */
class Str2IntHashSpec extends SparkSpec {

  test("native expression matches all golden vectors and the Column form") {
    // Provenance: str2hashconv_golden.json is the reference's own E7
    // parity-vector fixture (`spec/data/str2hashconv_spec.json`), carried
    // over byte-identical BY DESIGN — golden vectors for a hash-parity
    // contract are the same data in any implementation (SURVEY §5). It is
    // test data, not code.
    val path = getClass.getResource("/str2hashconv_golden.json").getPath
    val golden = spark.read.option("multiLine", true)
      .schema("input STRING, output INT").json(path)
    val mismatches = golden
      .withColumn("native", Str2IntHash.str2inthash(col("input")))
      .withColumn("composed", Converters.str2inthash(col("input")))
      .filter(!(col("native") <=> col("output")) || !(col("native") <=> col("composed")))
      .count()
    assert(mismatches == 0)
  }

  test("interpreted eval path agrees with codegen") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      import spark.implicits._
      val got = Seq("sV", "Z", "").toDF("s")
        .select(Str2IntHash.str2inthash(col("s"))).as[Int].collect()
      assert(got.toSeq == Seq(1570688519, -1674684077, -1042756200))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("extensions entry point installs the function on a fresh session") {
    // A fully fresh SparkContext is too heavy for the suite; exercise the
    // injection wiring directly on the extensions container.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext) // must register w/o throwing
  }

  test("registered in the SQL surface") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT str2inthash('sV') AS h, str2inthash(NULL) AS hn").collect()(0)
    assert(r.getInt(0) == 1570688519)
    assert(r.getInt(1) == -1042756200)
  }
}

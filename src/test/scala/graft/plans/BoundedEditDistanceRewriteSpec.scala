package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The rewrite must (a) fire on every comparison shape with the banded
  * expression in the optimized plan, (b) return bit-identical rows to the
  * un-rewritten query, and (c) leave thresholded built-ins and
  * out-of-range bounds alone. Runs on an isolated child session
  * (extraOptimizations is session state). */
class BoundedEditDistanceRewriteSpec extends SparkSpec {

  private def withRule(): SparkSession = {
    val s = spark.newSession()
    BoundedEditDistanceRewrite.install(s)
    s
  }

  private def names(s: SparkSession): Unit = {
    import s.implicits._
    Seq("kitten", "sitting", "mitten", "kitchen", "abcdef", "abddef")
      .toDF("n").createOrReplaceTempView("bed_names")
  }

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def run(s: SparkSession, sql: String): Seq[String] =
    s.sql(sql).collect().map(_.mkString("|")).toSeq.sorted

  test("all five comparison shapes rewrite and stay bit-identical") {
    val s = withRule(); names(s); names(spark)
    val shapes = Seq(
      "levenshtein(a.n, b.n) <= 2", "2 >= levenshtein(a.n, b.n)",
      "levenshtein(a.n, b.n) < 3", "levenshtein(a.n, b.n) > 1",
      "levenshtein(a.n, b.n) >= 2", "levenshtein(a.n, b.n) = 2")
    shapes.foreach { p =>
      val q = s"SELECT a.n, b.n FROM bed_names a JOIN bed_names b ON a.n < b.n WHERE $p"
      val df = s.sql(q)
      assert(optimized(df).contains("levenshtein_within"),
        s"rule did not fire for: $p\n${optimized(df)}")
      assert(run(s, q) == run(spark, q), s"results diverged for: $p")
    }
  }

  test("thresholded built-in and out-of-range bounds are left alone") {
    val s = withRule(); names(s)
    val keep = Seq(
      "levenshtein(a.n, b.n, 2) >= 0", // already banded, -1 sentinel
      "levenshtein(a.n, b.n) <= 1000") // band would be the whole matrix
    keep.foreach { p =>
      val df = s.sql(
        s"SELECT a.n FROM bed_names a JOIN bed_names b ON a.n < b.n WHERE $p")
      assert(!optimized(df).contains("levenshtein_within"),
        s"rule fired where it should not: $p")
    }
  }

  test("the distance VALUE (not in a comparison) is untouched") {
    val s = withRule(); names(s)
    val df = s.sql(
      "SELECT levenshtein(a.n, b.n) AS d FROM bed_names a JOIN bed_names b ON a.n < b.n")
    assert(!optimized(df).contains("levenshtein_within"))
  }
}

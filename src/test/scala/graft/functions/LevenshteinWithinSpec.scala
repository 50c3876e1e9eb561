package graft.functions

import graft.SparkSpec
import graft.functions.expressions.LevenshteinWithin
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen

/** The banded DP must be bit-identical to full Levenshtein whenever the
  * true distance is within the threshold, and exactly k+1 beyond it —
  * checked against Spark's own `levenshtein` through a real projection
  * (codegen path) and against the textbook DP directly (interpreted
  * path). */
class LevenshteinWithinSpec extends SparkSpec {
  import spark.implicits._

  private def full(a: String, b: String): Int = {
    val s = a.codePoints().toArray; val t = b.codePoints().toArray
    val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to s.length; j <- 1 to t.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
    d(s.length)(t.length)
  }

  private val cases: Seq[(String, String)] = {
    val word = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("abcdxyz #".toSeq)).map(_.mkString))
    val g = Gen.listOfN(600, Gen.zip(word, word))
    g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(99L)).get
  }

  test("interpreted banded distance matches the textbook DP, clamped at k+1") {
    for (k <- Seq(0, 1, 2, 3, 5); (a, b) <- cases) {
      val want = math.min(full(a, b), k + 1).toLong
      val got = LevenshteinWithin.banded(
        UTF8String.fromString(a), UTF8String.fromString(b), k)
      assert(got == want, s"k=$k a='$a' b='$b'")
    }
  }

  test("codegen path agrees with Spark's levenshtein through a projection") {
    val df = cases.toDF("a", "b")
      .withColumn("fullDist", levenshtein(col("a"), col("b")).cast("long"))
      .withColumn("bounded", LevenshteinWithin(col("a"), col("b"), 3))
    df.collect().foreach { r =>
      val want = math.min(r.getAs[Long]("fullDist"), 4L)
      assert(r.getAs[Long]("bounded") == want,
        s"a='${r.getString(0)}' b='${r.getString(1)}'")
    }
  }

  test("nulls and degenerate inputs") {
    val df = Seq((Some("abc"), None: Option[String]), (None, Some("x")),
      (Some(""), Some("")), (Some(""), Some("abcd")))
      .toDF("a", "b")
      .withColumn("d", LevenshteinWithin(col("a"), col("b"), 3))
    val got = df.select("d").collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    assert(got.toSeq == Seq(-1L, -1L, 0L, 4L))
  }
}

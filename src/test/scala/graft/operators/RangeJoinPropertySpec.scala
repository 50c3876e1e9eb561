package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests for the binned range join: for random point sets, interval
  * sets and bin widths, the operator's output multiset equals the naive
  * quadratic reference — i.e. binning neither drops a boundary match nor
  * duplicates a pair across bins, at any width. */
class RangeJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val seed = org.scalacheck.rng.Seed(7L)
  private def samples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, seed).get

  private val domain = Gen.chooseNum(-5000L, 5000L)

  test("output multiset == naive quadratic join across random widths") {
    val points = samples(domain, 400) // repeats expected: one row per input row
    val ivs = samples(Gen.zip(domain, Gen.chooseNum(0L, 800L)), 60)
      .zipWithIndex.map { case ((lo, span), i) => (i, lo, lo + span) }
    val naive: Map[(Long, Int), Int] = (for {
      p <- points; (id, lo, hi) <- ivs if p >= lo && p <= hi
    } yield (p, id)).groupBy(identity).view.mapValues(_.size).toMap

    val pdf = points.toDF("p")
    val idf = ivs.toDF("id", "lo", "hi")
    for (w <- Seq(1L, 13L, 100L, 797L, 5000L)) {
      val got = RangeJoin.pointInInterval(pdf, "p", idf, "lo", "hi", w)
        .groupBy(col("p"), col("id")).agg(count(lit(1)).as("n"))
        .as[(Long, Int, Long)].collect()
        .map { case (p, id, n) => (p, id) -> n.toInt }.toMap
      assert(got === naive, s"binWidth=$w multiset mismatch")
    }
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binned interval join: exact parity with the naive non-equi join, exactly-
  * once pair production across bin boundaries, and a plan with no nested-loop
  * join. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def naive(points: Seq[Long], ivs: Seq[(Int, Long, Long)]): Set[(Long, Int)] =
    (for {
      p <- points
      (id, lo, hi) <- ivs
      if p >= lo && p <= hi
    } yield (p, id)).toSet

  private def binned(points: Seq[Long], ivs: Seq[(Int, Long, Long)], w: Long): Set[(Long, Int)] = {
    val pdf = points.toDF("p")
    val idf = ivs.toDF("id", "lo", "hi")
    RangeJoin.pointInInterval(pdf, "p", idf, "lo", "hi", w)
      .select(col("p"), col("id"))
      .as[(Long, Int)].collect().toSet
  }

  test("matches the naive cross-join semantics, inclusive bounds") {
    val points = Seq(0L, 5L, 10L, 15L, 99L, 100L, 101L, 250L)
    val ivs = Seq((1, 0L, 10L), (2, 10L, 100L), (3, 240L, 260L), (4, 500L, 600L))
    for (w <- Seq(1L, 7L, 10L, 64L, 1000L))
      assert(binned(points, ivs, w) === naive(points, ivs), s"binWidth=$w")
  }

  test("each qualifying pair is produced exactly once even when an interval spans many bins") {
    val pdf = Seq(50L).toDF("p")
    val idf = Seq((1, 0L, 1000L)).toDF("id", "lo", "hi")
    // interval spans 101 bins at w=10; the point must still match once
    val rows = RangeJoin.pointInInterval(pdf, "p", idf, "lo", "hi", 10L).collect()
    assert(rows.length === 1)
  }

  test("negative domains bin correctly (floor, not truncate-toward-zero)") {
    val points = Seq(-15L, -10L, -5L, 0L, 5L)
    val ivs = Seq((1, -12L, -2L), (2, -3L, 3L))
    assert(binned(points, ivs, 7L) === naive(points, ivs))
  }

  test("plans as an equi join — no BroadcastNestedLoopJoin") {
    val pdf = spark.range(1000).select(col("id").as("p"))
    val idf = spark.range(100).select(col("id").as("iid"),
      (col("id") * 10).as("lo"), (col("id") * 10 + 20).as("hi"))
    val df = RangeJoin.pointInInterval(pdf, "p", idf, "lo", "hi", 16L)
    df.collect() // finalize AQE so the string shows the real join nodes
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop join in plan:\n$plan")
    assert(plan.contains("Join"), plan)
  }

  test("rejects non-positive bin widths") {
    val pdf = Seq(1L).toDF("p")
    val idf = Seq((1, 0L, 2L)).toDF("id", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pdf, "p", idf, "lo", "hi", 0L)
    }
  }
}

package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The automatic range-join rewrite: fires only on pure inequality joins
  * with the conf set, produces exactly the naive join's rows, and removes
  * the nested-loop plan. Runs on an isolated child session (extraOptimizations
  * and the conf are session-state scoped — the shared suite session stays
  * untouched). */
class RangeJoinRewriteSpec extends SparkSpec {

  private def withRuleSession(binWidth: Long)(f: SparkSession => Unit): Unit = {
    val s = spark.newSession()
    RangeJoinRewrite.install(s)
    if (binWidth > 0) s.conf.set(RangeJoinRewrite.binWidthKey, binWidth.toString)
    f(s)
  }

  /** Materialize, then string-scan the final plan: AQE wraps the tree in
    * AdaptiveSparkPlanExec whose current plan is not in `children`, so a
    * node-type traversal is vacuous. */
  private def hasBnlj(df: org.apache.spark.sql.DataFrame): Boolean = {
    df.collect()
    df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin")
  }

  private def setup(s: SparkSession): Unit = {
    import s.implicits._
    Seq(3L, 10L, 25L, 26L, 99L, 100L).toDF("p").createOrReplaceTempView("pts")
    Seq((1, 0L, 10L), (2, 20L, 30L), (3, 90L, 200L), (4, 500L, 600L))
      .toDF("id", "lo", "hi").createOrReplaceTempView("ivs")
  }

  private val rangeSql =
    "SELECT p, id FROM pts JOIN ivs ON p >= lo AND p <= hi ORDER BY p, id"

  test("rewrites a pure inequality join to an equi plan with identical rows") {
    withRuleSession(16L) { s =>
      setup(s)
      val df = s.sql(rangeSql)
      assert(!hasBnlj(df), s"still nested-loop:\n${df.queryExecution.executedPlan}")
      assert(df.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ===
        Seq((3L, 1), (10L, 1), (25L, 2), (26L, 2), (99L, 3), (100L, 3)))
    }
  }

  test("strict bounds and mirrored operand order produce exact rows") {
    withRuleSession(8L) { s =>
      setup(s)
      val df = s.sql("SELECT p, id FROM pts JOIN ivs ON lo < p AND hi > p ORDER BY p, id")
      assert(!hasBnlj(df))
      assert(df.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ===
        Seq((3L, 1), (25L, 2), (26L, 2), (99L, 3), (100L, 3)))
    }
  }

  test("point side on the right still rewrites") {
    withRuleSession(16L) { s =>
      setup(s)
      val df = s.sql(
        "SELECT p, id FROM ivs JOIN pts ON p >= lo AND p <= hi ORDER BY p, id")
      assert(!hasBnlj(df))
      assert(df.count() === 6)
    }
  }

  test("disabled by default: without the conf the plan keeps the nested loop") {
    withRuleSession(0L) { s =>
      setup(s)
      assert(hasBnlj(s.sql(rangeSql)))
    }
  }

  test("joins with an equi conjunct are left alone") {
    withRuleSession(16L) { s =>
      import s.implicits._
      Seq((1L, 5L), (2L, 50L)).toDF("k", "v").createOrReplaceTempView("a")
      Seq((1L, 0L, 10L), (2L, 0L, 10L)).toDF("k2", "lo", "hi")
        .createOrReplaceTempView("b")
      val df = s.sql("SELECT k, k2 FROM a JOIN b ON k = k2 AND v >= lo AND v <= hi")
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_bin"), plan)
      assert(df.collect().map(_.getLong(0)).toSeq === Seq(1L))
    }
  }

  test("the shared session is unaffected (session-state isolation)") {
    import spark.implicits._
    Seq(1L).toDF("p").createOrReplaceTempView("iso_pts")
    Seq((1, 0L, 2L)).toDF("id", "lo", "hi").createOrReplaceTempView("iso_ivs")
    val df = spark.sql("SELECT p, id FROM iso_pts JOIN iso_ivs ON p >= lo AND p <= hi")
    assert(!df.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
  }

  test("parity with the operator on the events workload shape") {
    withRuleSession(300L) { s =>
      import s.implicits._
      val rnd = new scala.util.Random(42)
      val pts = (1 to 2000).map(_ => rnd.nextLong(100000L)).toDF("p")
      val ivs = (1 to 200).map { i =>
        val lo = rnd.nextLong(100000L); (i, lo, lo + 300L)
      }.toDF("id", "lo", "hi")
      pts.createOrReplaceTempView("ev_pts"); ivs.createOrReplaceTempView("ev_ivs")
      val ruled = s.sql(
        "SELECT id, count(*) AS n FROM ev_pts JOIN ev_ivs ON p >= lo AND p <= hi GROUP BY id")
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      val naive = graft.operators.RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 300L)
        .groupBy(col("id")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      assert(ruled === naive)
    }
  }
}

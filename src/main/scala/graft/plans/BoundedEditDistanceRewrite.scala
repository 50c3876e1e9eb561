package graft.plans

import graft.functions.expressions.LevenshteinWithin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite THRESHOLDED full-Levenshtein comparisons into
  * the banded [[LevenshteinWithin]] expression, automatically.
  *
  * Users (and the fuzzy-join SQL surface) write the natural predicate —
  * `levenshtein(a, b) <= 3` — whose unthresholded expression runs the full
  * O(|a|*|b|) DP per row even though everything beyond the threshold is a
  * don't-care. This rule detects every comparison of an unthresholded
  * `levenshtein` against an integral literal bound and substitutes the
  * banded form (O(k*len), per-row early exit), preserving the comparison
  * bit-for-bit: `levenshtein_within(a, b, k)` is the exact distance when
  * <= k and k+1 otherwise, so
  *
  *   dist <= k  <=>  lw_k <= k        dist >  k  <=>  lw_k > k
  *   dist <  k  <=>  lw_(k-1) < k     dist >= k  <=>  lw_(k-1) >= k
  *   dist == k  <=>  lw_k == k
  *
  * (Spark 3.5+ also ships `levenshtein(a, b, threshold)`, which is banded
  * but returns the -1 SENTINEL beyond the threshold — a value that inverts
  * every ordering comparison, so a sentinel-based rewrite would need
  * per-shape sign fix-ups and breaks `ORDER BY dist`. The clamped form
  * composes with all five shapes directly; comparisons that already use
  * the thresholded built-in are left untouched.)
  *
  * Bounds above [[MaxK]] are left alone: the band no longer pays there. */
class BoundedEditDistanceRewrite extends Rule[LogicalPlan] {

  import BoundedEditDistanceRewrite._

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // dist <= k  /  k >= dist
      case LessThanOrEqual(FullLev(a, b), Bound(k)) if k >= 0 =>
        LessThanOrEqual(LevenshteinWithin(a, b, k.toInt), lit(k))
      case GreaterThanOrEqual(Bound(k), FullLev(a, b)) if k >= 0 =>
        GreaterThanOrEqual(lit(k), LevenshteinWithin(a, b, k.toInt))
      // dist < k  /  k > dist   (band at k-1)
      case LessThan(FullLev(a, b), Bound(k)) if k >= 1 =>
        LessThan(LevenshteinWithin(a, b, k.toInt - 1), lit(k))
      case GreaterThan(Bound(k), FullLev(a, b)) if k >= 1 =>
        GreaterThan(lit(k), LevenshteinWithin(a, b, k.toInt - 1))
      // dist > k  /  k < dist
      case GreaterThan(FullLev(a, b), Bound(k)) if k >= 0 =>
        GreaterThan(LevenshteinWithin(a, b, k.toInt), lit(k))
      case LessThan(Bound(k), FullLev(a, b)) if k >= 0 =>
        LessThan(lit(k), LevenshteinWithin(a, b, k.toInt))
      // dist >= k  /  k <= dist   (band at k-1)
      case GreaterThanOrEqual(FullLev(a, b), Bound(k)) if k >= 1 =>
        GreaterThanOrEqual(LevenshteinWithin(a, b, k.toInt - 1), lit(k))
      case LessThanOrEqual(Bound(k), FullLev(a, b)) if k >= 1 =>
        LessThanOrEqual(lit(k), LevenshteinWithin(a, b, k.toInt - 1))
      // dist == k
      case EqualTo(FullLev(a, b), Bound(k)) if k >= 0 =>
        EqualTo(LevenshteinWithin(a, b, k.toInt), lit(k))
      case EqualTo(Bound(k), FullLev(a, b)) if k >= 0 =>
        EqualTo(lit(k), LevenshteinWithin(a, b, k.toInt))
    }
}

object BoundedEditDistanceRewrite {

  /** Beyond this the band is most of the matrix — not worth rewriting. */
  val MaxK = 64

  private def lit(k: Long): Literal = Literal(k, LongType)

  /** An UNthresholded levenshtein over strings (the thresholded built-in
    * is already banded and uses a -1 sentinel — leave it alone). */
  private object FullLev {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Levenshtein(a, b, None)
          if a.dataType == StringType && b.dataType == StringType =>
        Some((a, b))
      case _ => None
    }
  }

  /** A foldable integral bound within the band's payoff range, possibly
    * behind an analyzer-inserted integral cast. */
  private object Bound {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Byte, ByteType) => inRange(v.toLong)
      case Literal(v: Short, ShortType) => inRange(v.toLong)
      case Literal(v: Int, IntegerType) => inRange(v.toLong)
      case Literal(v: Long, LongType) => inRange(v)
      case Cast(inner, dt, _, _) if dt == IntegerType || dt == LongType =>
        unapply(inner)
      case _ => None
    }
    private def inRange(k: Long): Option[Long] =
      if (k <= MaxK) Some(k) else None
  }

  /** Install on an already-built session (the extensions path installs it
    * for infrastructure-built sessions, [[GraftExtensions]]). */
  def install(spark: SparkSession): Unit = {
    val already = spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[BoundedEditDistanceRewrite])
    if (!already) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new BoundedEditDistanceRewrite
    }
  }
}

package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a pure inequality (range) join into the binned
  * equi-join of [[graft.operators.RangeJoin]], automatically.
  *
  * Spark plans an inner join whose condition has NO equi conjunct as
  * BroadcastNestedLoopJoin — O(n x m) comparisons with one side fully
  * broadcast. Interval predicates over the SQL surface ("rows inside any
  * incident window") therefore stop scaling the moment both sides grow. This
  * rule detects the shape
  *
  *   A JOIN B ON  x >= lo AND x <= hi        (x from one side; lo, hi from
  *                                            the other; all integral; strict
  *                                            variants allowed; extra
  *                                            conjuncts allowed as residual)
  *
  * and rewrites it to
  *
  *   Project(A.out ++ B.out,
  *     Join(A + bin(x), Generate(explode(sequence(bin(lo), bin(hi))), B),
  *          bin(x) = bin_seq AND <original condition>))
  *
  * Binning uses exact integer floor-division (`(v - pmod(v, w)) div w`), so a
  * point falls in exactly one bin and every qualifying pair is produced
  * exactly once; the full original condition is kept as the residual filter.
  * The planner then sees an equi key and picks a shuffle hash / sort-merge
  * join: both sides hash-partition on the bin id, nothing is broadcast, AQE
  * handles a hot bin.
  *
  * Opt-in via `spark.graft.rangeJoin.binWidth` (long, in the joined column's
  * units; 0 = disabled). Pick a width near the typical interval span: the
  * interval side is replicated once per overlapped bin (`span/w + 1` rows),
  * so a width far below the span multiplies the interval side, and a width
  * far above it degrades bin selectivity toward the nested-loop cost. The
  * rule never fires on joins that already carry an equi conjunct — those
  * plan as hash joins with the range predicate as residual already.
  */
class RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  import RangeJoinRewrite._

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Which child an expression evaluates against: Some(true)=left,
    * Some(false)=right, None=both/neither. */
  private def side(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] =
    if (e.references.isEmpty) None
    else if (e.references.subsetOf(l.outputSet)) Some(true)
    else if (e.references.subsetOf(r.outputSet)) Some(false)
    else None

  /** Interpretations of one conjunct as "point bounded by expression from the
    * other side": (point, pointOnLeft, bound, boundIsLower). `a >= b` is both
    * a lower bound b on a and an upper bound a on b. */
  private def boundViews(c: Expression, l: LogicalPlan, r: LogicalPlan)
      : Seq[(Expression, Boolean, Expression, Boolean)] = {
    val ab = c match {
      case GreaterThanOrEqual(a, b) => Some((a, b))
      case GreaterThan(a, b) => Some((a, b))
      case LessThanOrEqual(a, b) => Some((b, a))
      case LessThan(a, b) => Some((b, a))
      case _ => None
    }
    ab.toSeq.flatMap { case (big, small) =>
      (side(big, l, r), side(small, l, r)) match {
        case (Some(sb), Some(ss)) if sb != ss && integral(big.dataType) && integral(small.dataType) =>
          Seq((big, sb, small, true), (small, ss, big, false))
        case _ => Nil
      }
    }
  }

  private def isEquiConjunct(c: Expression, l: LogicalPlan, r: LogicalPlan): Boolean = c match {
    case EqualTo(a, b) => side(a, l, r).isDefined && side(b, l, r).isDefined &&
      side(a, l, r) != side(b, l, r)
    case EqualNullSafe(a, b) => side(a, l, r).isDefined && side(b, l, r).isDefined &&
      side(a, l, r) != side(b, l, r)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(binWidthKey, "0").toLong
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (conjuncts.exists(isEquiConjunct(_, l, r))) j
        else {
          val views = conjuncts.flatMap(boundViews(_, l, r))
          // first point expression holding both a lower and an upper bound
          val candidate = views.collectFirst {
            case (x, onLeft, lo, true) if views.exists {
              case (x2, ol2, _, false) => ol2 == onLeft && x2.semanticEquals(x)
              case _ => false
            } =>
              val hi = views.collectFirst {
                case (x2, ol2, b, false) if ol2 == onLeft && x2.semanticEquals(x) => b
              }.get
              (x, onLeft, lo, hi)
          }
          candidate match {
            case None => j
            case Some((x, pointOnLeft, lo, hi)) =>
              val wLit = Literal(w, LongType)
              def binOf(e: Expression): Expression = {
                val el = Cast(e, LongType)
                IntegralDivide(Subtract(el, Pmod(el, wLit)), wLit)
              }
              val (pointPlan, ivPlan) = if (pointOnLeft) (l, r) else (r, l)
              val binAlias = Alias(binOf(x), "__graft_bin")()
              val pointSide = Project(pointPlan.output :+ binAlias, pointPlan)
              // Guard reversed intervals (lo > hi): Sequence defaults to step
              // -1 and would fan the row across every bin in between. A
              // reversed interval matches no point; null explodes to 0 rows.
              val rawSeq = new Sequence(binOf(lo), binOf(hi), None,
                Some(conf.sessionLocalTimeZone))
              val seqExpr = If(LessThanOrEqual(binOf(lo), binOf(hi)),
                rawSeq, Literal.create(null, rawSeq.dataType))
              val binSeq = AttributeReference("__graft_bin_seq", LongType, nullable = false)()
              val ivSide = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
                outer = false, qualifier = None, generatorOutput = Seq(binSeq), child = ivPlan)
              val equi = EqualTo(binAlias.toAttribute, binSeq)
              val (nl, nr) = if (pointOnLeft) (pointSide, ivSide) else (ivSide, pointSide)
              Project(j.output, Join(nl, nr, Inner, Some(And(equi, cond)), hint))
          }
        }
    }
  }
}

object RangeJoinRewrite {
  /** Bin width (in the joined column's units) for the automatic range-join
    * rewrite; 0 disables the rule. */
  val binWidthKey = "spark.graft.rangeJoin.binWidth"

  /** Post-hoc installation on an already-built session (the analog of
    * [[GraftFunctions.register]]; `spark.sql.extensions` is the build-time
    * path). */
  def install(spark: SparkSession): Unit = {
    val already = spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[RangeJoinRewrite])
    if (!already) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new RangeJoinRewrite
    }
  }
}

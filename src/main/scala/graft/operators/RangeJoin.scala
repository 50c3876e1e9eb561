package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join: point-in-interval matching WITHOUT an equi
  * key.
  *
  * Spark's planner has no hash/sort strategy for a pure inequality join —
  * `points JOIN intervals ON lo <= p AND p <= hi` compiles to
  * BroadcastNestedLoopJoin (O(|points| x |intervals|) comparisons, and the
  * whole interval side broadcast), which is exactly the plan that dies when
  * both sides scale. The reference's query layer exposes ad-hoc SQL over
  * replicated tables (SURVEY §2.8), so interval predicates like "events
  * inside an incident window" must stay runnable at corpus scale.
  *
  * The standard fix (used by every warehouse range-join optimization): pick a
  * bin width `w`, assign every point to bin `floor(p / w)`, explode every
  * interval across the bins it overlaps, equi-join on the bin id, then apply
  * the exact range predicate as a residual filter. A point lies in exactly
  * one bin, so each qualifying (point, interval) pair is produced exactly
  * once — no dedup pass. The join is now a plain shuffle equi-join: both
  * sides hash-partition on the bin id, AQE handles a skewed bin, and nothing
  * is broadcast.
  *
  * Cost model: the interval side is replicated `ceil(span/w) + 1` times per
  * row, the join fan-in per bin is (points in bin) x (intervals overlapping
  * bin). Pick `w` near the typical interval span: replication stays O(1) per
  * interval while bins stay selective.
  */
object RangeJoin {

  /** Join `points` to `intervals` where `points(pointCol)` falls in
    * `[intervals(loCol), intervals(hiCol)]` (inclusive both ends).
    *
    * All three columns must be integral (LongType after cast) — callers
    * join on epoch micros / seconds or any integer domain. Column names of
    * `points` and `intervals` must be disjoint (standard join hygiene; the
    * result carries both sides' columns).
    *
    * @param binWidth bin width in the joined column's units; choose close to
    *                 the typical interval span (see cost model above).
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val bin = "__graft_bin"
    def binOf(c: Column): Column = floor(c.cast("long") / binWidth).cast("long")
    val p = points.withColumn(bin, binOf(col(pointCol)))
    // Guard reversed intervals (lo > hi): Spark's sequence() defaults to
    // step -1 and would fan the row across every bin in between (or build an
    // enormous array for an extreme pair). A reversed interval matches no
    // point, so emit no bins: explode(null) generates zero rows.
    val iv = intervals.withColumn(
      bin, explode(when(col(loCol) <= col(hiCol),
        sequence(binOf(col(loCol)), binOf(col(hiCol))))))
    p.join(iv, Seq(bin))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(bin)
  }
}

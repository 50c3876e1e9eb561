package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with the same
  * key and a strictly earlier timestamp — the temporal-lookup primitive
  * (sessionization, point-in-time rates, "state as of event time"). Plus
  * the two standard variants: a match tolerance (reject stale matches) and
  * the forward direction (earliest strictly-later right row).
  *
  * Spark lacks this operator; per the custom-operator preference order it is
  * COMPOSED from built-ins rather than a custom SparkPlan: tag and union the
  * two sides, then one window pass per key ordered by (ts, side) carries the
  * last-seen right payload forward (`last_value ... ignoreNulls` over the
  * preceding frame). Exactly ONE shuffle on the key — same cost as a plain
  * join — and no per-key driver loops; ties (equal ts) resolve to
  * "right rows at the same instant do NOT match" (strict < / >) by ordering
  * right rows after left rows at equal timestamps. Tolerance is a post-scan
  * null-out of the carried struct — it never changes the plan shape.
  */
object AsofJoin {

  /** @param left      rows to annotate
    * @param right     lookup rows
    * @param keyCols   equality keys
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param payload   right columns to carry (appear in the output as
    *                  `asof_<name>`, null when no matching right row exists)
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTs: String, rightTs: String, payload: Seq[String]): DataFrame =
    asofImpl(left, right, keyCols, leftTs, rightTs, payload,
      forward = false, tolerance = None)

  /** Backward as-of with a tolerance: matches older than `tolerance` (in
    * the timestamp column's own units) are rejected — the whole carried row
    * nulls out atomically, exactly as if no match existed. */
  def asofWithin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                 leftTs: String, rightTs: String, payload: Seq[String],
                 tolerance: Long): DataFrame =
    asofImpl(left, right, keyCols, leftTs, rightTs, payload,
      forward = false, tolerance = Some(tolerance))

  /** Forward as-of: the EARLIEST right row strictly after the left row
    * (the "next state change" lookup), optional tolerance. */
  def asofForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  leftTs: String, rightTs: String, payload: Seq[String],
                  tolerance: Option[Long] = None): DataFrame =
    asofImpl(left, right, keyCols, leftTs, rightTs, payload,
      forward = true, tolerance = tolerance)

  private def asofImpl(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                       leftTs: String, rightTs: String, payload: Seq[String],
                       forward: Boolean, tolerance: Option[Long]): DataFrame = {
    val leftCols = left.columns.toSeq
    // ALL payload columns ride in ONE struct carried by a single
    // last(ignoreNulls): the whole latest right row is adopted atomically,
    // so null fields of that row stay null and no output mixes values from
    // different right rows (a per-column last() would resurrect older
    // non-null values). The matched timestamp rides along as `__mts` for
    // the tolerance check.
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => org.apache.spark.sql.types.StructField(
        p, right.schema(p).dataType)) :+
        org.apache.spark.sql.types.StructField("__mts", right.schema(rightTs).dataType))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(0)) // left sorts BEFORE right at equal ts -> strict
      .withColumn("__p", lit(null).cast(payloadType))
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(1))
      .withColumn("__p", struct(payload.map(col) :+ col(rightTs).as("__mts"): _*))
      .select((keyCols.map(col) ++ Seq(col("__ts"), col("__side"), col("__p")) ++
        leftCols.filterNot(c => keyCols.contains(c)).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val unioned = l.select((keyCols.map(col) ++
      Seq(col("__ts"), col("__side"), col("__p")) ++
      leftCols.filterNot(keyCols.contains).map(col)): _*)
      .unionByName(r)

    // Backward: ascending ts, preceding frame ends on the latest earlier
    // right row. Forward: DESCENDING ts, so the preceding frame holds the
    // later rows and last() lands on the earliest of them. Either way,
    // (ts, side) ordering keeps equal-ts right rows out of the frame.
    val ordering =
      if (forward) Seq(col("__ts").desc, col("__side").asc)
      else Seq(col("__ts").asc, col("__side").asc)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = unioned.withColumn("__asof",
      last(col("__p"), ignoreNulls = true).over(w))
    val withinTol: Column = tolerance match {
      case None => col("__asof")
      case Some(t) =>
        val gap =
          if (forward) col("__asof").getField("__mts") - col("__ts")
          else col("__ts") - col("__asof").getField("__mts")
        when(gap <= t, col("__asof")) // null __asof stays null
    }
    carried.filter(col("__side") === 0)
      .withColumn("__match", withinTol)
      .select((leftCols.map(col) ++
        payload.map(p => col("__match").getField(p).as(s"asof_$p"))): _*)
  }
}

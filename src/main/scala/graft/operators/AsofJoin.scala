package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with the same
  * key and a strictly earlier timestamp — the temporal-lookup primitive
  * (sessionization, point-in-time rates, "state as of event time").
  *
  * Spark lacks this operator; per the custom-operator preference order it is
  * COMPOSED from built-ins rather than a custom SparkPlan: tag and union the
  * two sides, then one window pass per key ordered by (ts, side) carries the
  * last-seen right payload forward (`last_value ... ignoreNulls` over the
  * preceding frame). Exactly ONE shuffle on the key — same cost as a plain
  * join — and no per-key driver loops; ties (equal ts) resolve to
  * "right rows at the same instant do NOT match" (strict <) by ordering
  * right rows after left rows at equal timestamps.
  */
object AsofJoin {

  /** @param left      rows to annotate
    * @param right     lookup rows
    * @param keyCols   equality keys
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param payload   right columns to carry (appear in the output as
    *                  `asof_<name>`, null when no earlier right row exists)
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // ALL payload columns ride in ONE struct carried by a single
    // last(ignoreNulls): the whole latest right row is adopted atomically,
    // so null fields of that row stay null and no output mixes values from
    // different right rows (a per-column last() would resurrect older
    // non-null values).
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => org.apache.spark.sql.types.StructField(
        p, right.schema(p).dataType)))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(0)) // left sorts BEFORE right at equal ts -> strict <
      .withColumn("__p", lit(null).cast(payloadType))
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(1))
      .withColumn("__p", struct(payload.map(col): _*))
      .select((keyCols.map(col) ++ Seq(col("__ts"), col("__side"), col("__p")) ++
        leftCols.filterNot(c => keyCols.contains(c)).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val unioned = l.select((keyCols.map(col) ++
      Seq(col("__ts"), col("__side"), col("__p")) ++
      leftCols.filterNot(keyCols.contains).map(col)): _*)
      .unionByName(r)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = unioned.withColumn("__asof",
      last(col("__p"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 0)
      .select((leftCols.map(col) ++
        payload.map(p => col("__asof").getField(p).as(s"asof_$p"))): _*)
  }
}

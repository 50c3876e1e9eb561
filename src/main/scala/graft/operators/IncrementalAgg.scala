package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a keyed rollup (count / sum /
  * min / max, and anything else decomposable) current under arriving
  * batches WITHOUT recomputing over history — fold each batch's partial
  * aggregate into the state with combine semantics:
  *
  *   state ⊕ partial(batch):  cnt+cnt, sum+sum, min(min), max(max)
  *
  * This is the maintenance loop behind a continuously-replicated warehouse
  * rollup: history-sized recompute is replaced by a merge whose cost is
  * O(|state keys| + |batch keys|) — and when the state table is stored
  * bucketed by key ([[BucketedStore]]), the merge co-locates and the only
  * shuffle left is the batch's own partial aggregation (map-side combined
  * by Spark automatically).
  *
  * Only ALGEBRAIC aggregates decompose this way (avg derives as sum/cnt at
  * read time; never maintain it directly). Holistic aggregates (exact
  * median/distinct) need the sketch path (queries/ExtraQueries q28).
  */
object IncrementalAgg {

  /** Partial aggregate of one batch: (keys..., cnt, cnt_v, sum_v, min_v,
    * max_v). `cnt` counts rows; `cnt_v` counts NON-NULL values — avg must
    * divide by the latter (SQL AVG ignores nulls; dividing a null-skipping
    * sum by a row count understates every nullable metric).
    * Sum runs in decimal so fold order can never change a bit. */
  def partial(batch: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        count(col(valueCol)).as("cnt_v"),
        sum(col(valueCol).cast("decimal(22,2)")).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Fold a batch partial into the state (both in [[partial]] layout).
    * Union + combine-aggregate: new keys appear, existing keys merge. */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("cnt_v")).as("cnt_v"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Read-time view: derived avg (over non-null values, like SQL AVG),
    * external types; the internal `cnt_v` stays internal. */
  def finish(state: DataFrame): DataFrame =
    state.select(
      (state.columns.filterNot(Seq("cnt", "cnt_v", "sum_v", "min_v", "max_v").contains)
        .map(col).toSeq ++ Seq(
        col("cnt"),
        col("sum_v").cast("double").as("sum_v"),
        col("min_v"), col("max_v"),
        // divide AFTER the double cast: decimal-division scale/rounding
        // rules differ across engines, double division does not.
        // cnt_v = 0 (all nulls) yields null, exactly like SQL AVG
        (col("sum_v").cast("double") /
          when(col("cnt_v") === 0, lit(null)).otherwise(col("cnt_v"))).as("avg_v"))): _*)
}

package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Incremental maintenance must equal full recompute under any batch split,
  * including empty deltas and batches that introduce brand-new keys. */
class IncrementalAggSpec extends SparkSpec {

  private val keys = Seq("l_returnflag", "l_linestatus")

  private def li = Tables.lineitem(spark, sfDir)
    .select("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity")

  private def direct = IncrementalAgg.finish(
    IncrementalAgg.partial(li, keys, "l_quantity"))

  private def collectSorted(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(keys.map(col): _*).collect().map(_.toSeq).toSeq

  test("folding 5 modulo batches equals the direct aggregate") {
    val state = (0 until 5)
      .map(i => IncrementalAgg.partial(
        li.filter(col("l_orderkey") % 5 === i), keys, "l_quantity"))
      .reduce((s, p) => IncrementalAgg.merge(s, p, keys))
    assert(collectSorted(IncrementalAgg.finish(state)) == collectSorted(direct))
  }

  test("an empty delta is a no-op") {
    val full = IncrementalAgg.partial(li, keys, "l_quantity")
    val empty = IncrementalAgg.partial(li.filter(lit(false)), keys, "l_quantity")
    val merged = IncrementalAgg.merge(full, empty, keys)
    assert(collectSorted(IncrementalAgg.finish(merged)) == collectSorted(direct))
  }

  test("a batch with only new keys appends them") {
    import spark.implicits._
    val state = IncrementalAgg.partial(li, keys, "l_quantity")
    val novel = Seq((999L, "Z", "Z", 5.0), (999L, "Z", "Z", 7.0))
      .toDF("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity")
    val merged = IncrementalAgg.finish(
      IncrementalAgg.merge(state, IncrementalAgg.partial(novel, keys, "l_quantity"), keys))
    val z = merged.filter(col("l_returnflag") === "Z").collect()(0)
    assert(z.getAs[Long]("cnt") == 2L)
    assert(z.getAs[Double]("sum_v") == 12.0)
    assert(z.getAs[Double]("min_v") == 5.0)
    assert(z.getAs[Double]("max_v") == 7.0)
    assert(z.getAs[Double]("avg_v") == 6.0)
    assert(merged.count() == direct.count() + 1)
  }
}

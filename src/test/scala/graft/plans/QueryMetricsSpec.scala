package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Metrics capture: job-group scoping makes attribution EXACT even though
  * the suite harness runs specs in parallel on one shared SparkContext —
  * these assertions are deliberately strict to prove it. */
class QueryMetricsSpec extends SparkSpec {

  test("a parquet scan reports exactly its own input bytes and records") {
    val m = QueryMetrics.measure(Tables.lineitem(spark, sfDir))
    assert(m.resultRows > 0)
    assert(m.inputBytes > 0)
    assert(m.inputRecords == m.resultRows)
    assert(m.wallMs >= 0)
    assert(QueryMetrics.render(m).contains(s"rows=${m.resultRows}"))
  }

  test("an aggregation's shuffle dwarfs a scan's count-only shuffle") {
    val agg = QueryMetrics.measure(
      Tables.lineitem(spark, sfDir)
        .repartition(8, col("l_returnflag"))
        .groupBy("l_returnflag").agg(sum("l_quantity")))
    assert(agg.shuffleWriteBytes > 0)
    assert(agg.shuffleReadBytes > 0)
    assert(agg.resultRows == 3)
    // count() itself shuffles its partial counts (a few dozen bytes);
    // the repartition+groupBy above must be visibly larger than that floor
    val scan = QueryMetrics.measure(Tables.region(spark, sfDir))
    assert(scan.shuffleWriteBytes < 1024,
      s"scan window captured foreign shuffle: ${scan.shuffleWriteBytes}")
    assert(agg.shuffleWriteBytes > scan.shuffleWriteBytes * 4)
  }

  test("sequential measurements attribute to their own run only") {
    val first = QueryMetrics.measure(Tables.nation(spark, sfDir))
    val second = QueryMetrics.measure(Tables.region(spark, sfDir))
    assert(first.resultRows == 25 && first.inputRecords == 25)
    assert(second.resultRows == 5 && second.inputRecords == 5)
  }
}

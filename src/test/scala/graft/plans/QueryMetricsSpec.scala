package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Metrics capture: scans report input bytes/records, shuffling queries
  * report shuffle traffic, and the listener detaches cleanly. */
class QueryMetricsSpec extends SparkSpec {

  test("a parquet scan reports input bytes and records") {
    val m = QueryMetrics.measure(Tables.lineitem(spark, sfDir))
    assert(m.resultRows > 0)
    assert(m.inputBytes > 0)
    assert(m.inputRecords == m.resultRows)
    assert(m.wallMs >= 0)
    assert(QueryMetrics.render(m).contains(s"rows=${m.resultRows}"))
  }

  // NOTE: the suite harness runs specs in PARALLEL on one shared
  // SparkContext, and listener events are context-wide — other suites'
  // tasks can land inside a measure window here. Production use scopes one
  // query per child session/job group (ReadonlyGuard's admission model),
  // where attribution is exact; these tests therefore assert only lower
  // bounds the measured query itself guarantees.

  test("an aggregation reports its shuffle traffic") {
    val agg = QueryMetrics.measure(
      Tables.lineitem(spark, sfDir)
        .repartition(8, col("l_returnflag"))
        .groupBy("l_returnflag").agg(sum("l_quantity")))
    assert(agg.shuffleWriteBytes > 0)
    assert(agg.shuffleReadBytes > 0)
    assert(agg.resultRows == 3)
  }

  test("sequential measurements detach cleanly and count their own rows") {
    val first = QueryMetrics.measure(Tables.nation(spark, sfDir))
    val second = QueryMetrics.measure(Tables.region(spark, sfDir))
    assert(first.resultRows == 25 && first.inputRecords >= 25)
    assert(second.resultRows == 5 && second.inputRecords >= 5)
  }
}

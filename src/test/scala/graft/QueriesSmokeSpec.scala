package graft

/** Every declared query runs and returns rows at sf0.001 (the deep
  * value-equality gate is the DuckDB oracle via Verify + tools/check.py). */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is declared rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      assert(fn(spark, sfDir).count() > 0)
    }
  }
}

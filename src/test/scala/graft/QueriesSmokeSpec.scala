package graft

/** Every declared query runs and returns rows at sf0.001 (the deep
  * value-equality gate is the DuckDB oracle via Verify + tools/check.py). */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Queries intentionally without a SQL oracle (engine-specific estimates;
    * the driver records a rows-only check). Keep this list short and
    * deliberate. */
  private val rowsOnly = Set("q28_sketches")

  test("every query has an oracle or is declared rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("sketch estimates track exact cardinalities (q28 vs q27)") {
    val exact = SparkEntry.queries("q27_distinct_counts")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    SparkEntry.queries("q28_sketches")(spark, sfDir).collect().foreach { r =>
      val est = r.getLong(1).toDouble
      val ex = exact(r.getString(0)).toDouble
      assert(math.abs(est - ex) / ex < 0.1, s"${r.getString(0)}: $est vs $ex")
    }
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      assert(fn(spark, sfDir).count() > 0)
    }
  }
}

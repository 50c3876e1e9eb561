package graft

/** Every declared query runs and returns rows at sf0.001 (the deep
  * value-equality gate is the DuckDB oracle via Verify + tools/check.py). */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("sketch estimates land inside their declared error envelopes (q28)") {
    // q28's oracle gate IS these booleans (the DuckDB side emits TRUE);
    // assert them here too so a drifting sketch fails fast with names
    SparkEntry.queries("q28_sketches")(spark, sfDir).collect().foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: HLL outside 6% envelope")
      assert(r.getBoolean(3), s"${r.getString(0)}: approx median outside p45..p55")
    }
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      assert(fn(spark, sfDir).count() > 0)
    }
  }
}

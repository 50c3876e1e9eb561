package graft.plans

import graft.SparkSpec

/** §3.3 error-help envelope: error -> hint mapping + the 15 s statement
  * timeout (scaled down), mirroring `organization.rb:171-191`. */
class ReadonlyGuardHelpSpec extends SparkSpec {
  import spark.implicits._

  private def setup(): Unit =
    Seq((1, "a"), (2, "b")).toDF("id", "v")
      .createOrReplaceTempView("guard_help_t")

  test("a good query returns Right with rows") {
    setup()
    val r = ReadonlyGuard.runWithHelp(spark, "SELECT id FROM guard_help_t ORDER BY id")
    assert(r.isRight)
    assert(r.toOption.get.df.count() == 2)
  }

  test("unknown table maps to the db-tables hint") {
    val r = ReadonlyGuard.runWithHelp(spark, "SELECT * FROM no_such_table_xyz")
    assert(r.isLeft)
    val e = r.swap.toOption.get
    assert(e.kind == "undefined_table")
    assert(e.hint.contains("db tables"))
  }

  test("unknown column maps to the column hint") {
    setup()
    val r = ReadonlyGuard.runWithHelp(spark, "SELECT nope FROM guard_help_t")
    assert(r.isLeft)
    assert(r.swap.toOption.get.kind == "undefined_column")
  }

  test("writes map to the read-only hint") {
    setup()
    val r = ReadonlyGuard.runWithHelp(spark, "DROP TABLE guard_help_t")
    assert(r.isLeft)
    val e = r.swap.toOption.get
    assert(e.kind == "rejected")
    assert(e.hint.contains("read-only"))
  }

  test("a runaway query is cancelled at the statement timeout") {
    val r = ReadonlyGuard.runWithHelp(spark,
      "SELECT count(*) FROM range(100000000000)", timeoutMs = 800)
    assert(r.isLeft, s"expected timeout, got $r")
    val e = r.swap.toOption.get
    assert(e.kind == "timeout")
    assert(e.hint.contains("Narrow"))
  }
}

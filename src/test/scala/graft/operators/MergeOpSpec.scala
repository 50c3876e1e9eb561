package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Port of the reference's replicator contract suites (SURVEY §5):
  * "a replicator" insert behavior, "prevents overwriting new data with old"
  * (U2), in-batch last-wins (U4), set-once (U3), skip-nil (E20). */
class MergeOpSpec extends SparkSpec {
  import spark.implicits._

  private val spec = MergeSpec(
    keyCols = Seq("k"), orderCol = "seq",
    updateWhere = (t, s) => s("updated") > t("updated"))

  private def df(rows: (String, Long, Long, String)*) =
    rows.toDF("k", "seq", "updated", "payload")

  test("inserts new keys, updates newer, keeps newer target (U1+U2)") {
    val target = df(("a", 1, 100, "a-old"), ("b", 1, 200, "b-new"))
    val source = df(("a", 2, 150, "a-upd"), ("b", 2, 150, "b-stale"), ("c", 2, 50, "c-ins"))
    val got = Merge.upsert(target, source, spec)
      .orderBy("k").as[(String, Long, Long, String)].collect()
    assert(got === Array(
      ("a", 2L, 150L, "a-upd"),   // newer source wins
      ("b", 1L, 200L, "b-new"),   // stale source must NOT overwrite
      ("c", 2L, 50L, "c-ins")))   // insert
  }

  test("upsert is idempotent (at-least-once ingest, exactly-once effect)") {
    val target = df(("a", 1, 100, "a1"))
    val source = df(("a", 2, 150, "a2"), ("b", 2, 90, "b1"))
    val once = Merge.upsert(target, source, spec)
    val twice = Merge.upsert(once, source, spec)
    assert(twice.orderBy("k").collect() === once.orderBy("k").collect())
  }

  test("in-batch duplicate keys collapse last-wins by ingest order (U4)") {
    val target = df()
    val source = df(("a", 1, 100, "first"), ("a", 3, 100, "last"), ("a", 2, 100, "mid"))
    val got = Merge.upsert(target, source, spec).as[(String, Long, Long, String)].collect()
    assert(got === Array(("a", 3L, 100L, "last")))
  }

  test("set-once columns never change after insert (U3)") {
    val s = MergeSpec(Seq("k"), "seq", coalesceOnUpdate = Seq("payload"))
    val target = df(("a", 1, 100, "original"))
    val source = df(("a", 2, 200, "rewrite"))
    val got = Merge.upsert(target, source, s).as[(String, Long, Long, String)].collect()
    assert(got(0) == ("a", 2L, 200L, "original"))
  }

  test("skip-nil: source null does not clobber target value (E20)") {
    val s = MergeSpec(Seq("k"), "seq", skipNilCols = Seq("payload"))
    val target = df(("a", 1, 100, "keepme"))
    val source = Seq(("a", 2L, 200L, Option.empty[String])).toDF("k", "seq", "updated", "payload")
    val got = Merge.upsert(target, source, s).as[(String, Long, Long, String)].collect()
    assert(got(0) == ("a", 2L, 200L, "keepme"))
  }

  test("changedRows emits only inserts and real updates (U7 rowupsert)") {
    val target = df(("a", 1, 100, "a"), ("b", 1, 200, "b"))
    val source = df(("a", 2, 150, "a2"), ("b", 2, 50, "stale"), ("c", 1, 10, "c"))
    val changed = Merge.changedRows(target, source, spec)
      .select("k").as[String].collect().sorted
    assert(changed === Array("a", "c")) // b's stale update suppressed
  }
}

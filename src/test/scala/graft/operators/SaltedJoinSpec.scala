package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Salted join: result parity with the plain join (salting is layout, not
  * semantics) and the layout actually spreads a hot key across tasks. */
class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("parity with the plain join on a skewed key") {
    val big = (1 to 5000).map(i => (if (i % 10 == 0) 7L else i % 5L, i.toLong))
      .toDF("k", "v")
    val dim = Seq((7L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (0L, "z"))
      .toDF("k", "name")
    val salted = SaltedJoin.join(big, dim, Seq("k"), salts = 8)
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect().map(_.toSeq)
    val plain = big.join(dim, Seq("k"))
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect().map(_.toSeq)
    assert(salted.toSeq == plain.toSeq)
  }

  test("salt is deterministic: recomputing the salted side assigns identical salts") {
    // a retry-safe salt must be a pure function of row content — recomputing
    // the same input (as a stage re-execution would) must yield the same
    // assignment, or rows migrate across reduce partitions mid-retry
    val big = (1 to 2000).map(i => (7L, i.toLong)).toDF("k", "v")
    val dim = Seq((7L, "hot")).toDF("k", "name")
    def run() = SaltedJoin.join(big, dim, Seq("k"), salts = 8, rowId = Some("v"))
      .groupBy("v").count().orderBy("v").collect().map(_.toSeq).toSeq
    assert(run() == run())
    // and each row joined exactly once (no duplication from replication)
    assert(SaltedJoin.join(big, dim, Seq("k"), salts = 8, rowId = Some("v")).count() == 2000L)
  }

  test("the hot key's rows spread across many partitions after the join shuffle") {
    // broadcast disabled: with a broadcastable dim there is no shuffle and
    // no skew problem — salting exists for compact-but-not-broadcastable
    // sides, so the test forces the shuffled path both engines would take
    // also pin AQE's partition coalescing off: the test data is tiny, and
    // folding the 8 salt partitions back into one would hide the spread
    // this test exists to observe (at real scale the partitions are fat
    // enough that AQE keeps them apart)
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      val big = (1 to 20000).map(i => (7L, i.toLong)).toDF("k", "v") // ALL rows hot
      val dim = Seq((7L, "hot")).toDF("k", "name")
      val spread = SaltedJoin.join(big.repartition(8), dim, Seq("k"), salts = 8)
        .withColumn("pid", spark_partition_id())
        .select("pid").distinct().count()
      val unsalted = big.repartition(8).join(dim, Seq("k"))
        .withColumn("pid", spark_partition_id())
        .select("pid").distinct().count()
      assert(unsalted == 1L,
        s"plain join should funnel the hot key into one partition, got $unsalted")
      assert(spread >= 4L,
        s"salted join should spread the hot key, got $spread partitions")
    } finally prev.foreach { case (c, v) =>
      v.fold(spark.conf.unset(c))(spark.conf.set(c, _)) }
  }

  test("low-cardinality payload columns: content salt collapses, rowId salt spreads") {
    // The adversarial case for the content-hash salt: every hot-key row
    // carries one of only TWO distinct payloads, so without a rowId the
    // salt basis has 2 values and the hot key lands on at most 2 of the 8
    // salts — silently recreating the skew the operator exists to remove.
    // A unique rowId restores the uniform spread. Both paths stay correct;
    // this asserts the LAYOUT difference, so callers know to pass rowId.
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      val big = (1 to 20000).map(i => (7L, (i % 2).toLong, i.toLong))
        .toDF("k", "payload", "id")
      val dim = Seq((7L, "hot")).toDF("k", "name")
      def spreadOf(df: org.apache.spark.sql.DataFrame, rowId: Option[String]) =
        SaltedJoin.join(df, dim, Seq("k"), salts = 8, rowId = rowId)
          .withColumn("pid", spark_partition_id())
          .select("pid").distinct().count()
      val contentOnly = spreadOf(big.select("k", "payload"), None) // basis: 2 values
      val withRowId = spreadOf(big, Some("id"))                    // basis: unique id
      assert(contentOnly <= 2L,
        s"content salt over 2 distinct payloads can reach at most 2 salts, got $contentOnly")
      assert(withRowId >= 4L,
        s"rowId salt should spread the hot key, got $withRowId partitions")
      // and parity holds on the degraded path too — degradation is layout-only
      val n = SaltedJoin.join(big.select("k", "payload"), dim, Seq("k"), salts = 8).count()
      assert(n == 20000L)
    } finally prev.foreach { case (c, v) =>
      v.fold(spark.conf.unset(c))(spark.conf.set(c, _)) }
  }
}

package graft.sources

import graft.SparkSpec
import graft.operators.Projection
import org.apache.spark.sql.functions._

/** Executor-side backfill DataSourceV2 (S8/S12 scale path): one
  * InputPartition per independent cursor, pagination inside the reader,
  * same retry/abort contract as the driver-side loop. Fetchers live in the
  * companion object — defined in the spec class they'd capture the
  * (unserializable) suite via `$outer` and never reach an executor. */
class DistributedBackfillSpec extends SparkSpec {

  import DistributedBackfillSpec._

  test("one partition per fetcher; all pages land with per-cursor ordered seqs") {
    val df = DistributedBackfill.read(spark,
      Seq(Pager("a", 3), Pager("b", 2), Pager("c", 1)))
    assert(df.rdd.getNumPartitions == 3) // cursor = partition = executor task
    val rows = df.collect()
    assert(rows.length == 12) // 3*2 + 2*2 + 1*2 items
    // seq encodes (fetcherIdx << 40 | itemIdx): deterministic, page order
    // preserved within each cursor for the last-wins dedup
    val byCursor = rows.groupBy(_.getLong(1) >> 40)
    assert(byCursor.keySet == Set(0L, 1L, 2L))
    byCursor.foreach { case (_, rs) =>
      val idx = rs.map(_.getLong(1) & ((1L << 40) - 1)).sorted
      assert(idx.toSeq == (0L until rs.length.toLong))
    }
  }

  test("retries transient failures per page; FatalFetchError stops one cursor only") {
    flaked.set(false)
    val df = DistributedBackfill.read(spark, Seq(FlakyPager("a", 3), AuthDies("b")))
    val bodies = df.select("body").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSet
    // a: all 3 pages (page 1 retried); b: first page kept, 401 stopped it
    assert(bodies == Set(item("a-0-0", 0), item("a-1-0", 1), item("a-2-0", 2),
      item("b-0", 0)))
  }

  test("gives up after maxAttempts on a persistently failing page") {
    assertThrows[org.apache.spark.SparkException] {
      DistributedBackfill.read(spark, Seq(AlwaysFails()), maxAttempts = 2).count()
    }
  }

  test("maxPages caps a runaway cursor") {
    assert(DistributedBackfill.read(spark, Seq(Endless()), maxPages = 5).count() == 5)
  }

  test("result feeds the standard webhook schema") {
    val df = DistributedBackfill.read(spark, Seq(Pager("a", 1)))
    assert(df.schema.fieldNames.toSeq == Seq("body", Projection.IngestSeqCol))
    assert(df.filter(col("body").isNull).count() == 0)
  }
}

object DistributedBackfillSpec {

  def item(id: String, n: Int): String = s"""{"id":"$id","n":$n}"""

  /** Local-mode executors share the JVM, so the transient-failure flag in
    * this (static) companion is observable from reader tasks. */
  val flaked = new java.util.concurrent.atomic.AtomicBoolean(false)

  final case class Pager(prefix: String, pages: Int, perPage: Int = 2)
      extends DistributedBackfill.PageFetcher {
    def fetchPage(token: Option[String]): (Seq[String], Option[String]) = {
      val p = token.map(_.toInt).getOrElse(0)
      val items = (0 until perPage).map(i => item(s"$prefix-$p-$i", p * perPage + i))
      (items, if (p + 1 < pages) Some((p + 1).toString) else None)
    }
  }

  /** Throws a transient 503 exactly once, on page 1. */
  final case class FlakyPager(prefix: String, pages: Int)
      extends DistributedBackfill.PageFetcher {
    def fetchPage(token: Option[String]): (Seq[String], Option[String]) = {
      val p = token.map(_.toInt).getOrElse(0)
      if (p == 1 && flaked.compareAndSet(false, true))
        throw new RuntimeException("transient 503")
      (Seq(item(s"$prefix-$p-0", p)), if (p + 1 < pages) Some((p + 1).toString) else None)
    }
  }

  /** First page ok, then a 401 (fatal, no retry). */
  final case class AuthDies(prefix: String) extends DistributedBackfill.PageFetcher {
    def fetchPage(token: Option[String]): (Seq[String], Option[String]) = token match {
      case None => (Seq(item(s"$prefix-0", 0)), Some("1"))
      case _ => throw new Backfiller.FatalFetchError("401")
    }
  }

  final case class AlwaysFails() extends DistributedBackfill.PageFetcher {
    def fetchPage(token: Option[String]): (Seq[String], Option[String]) =
      throw new RuntimeException("500")
  }

  final case class Endless() extends DistributedBackfill.PageFetcher {
    def fetchPage(token: Option[String]): (Seq[String], Option[String]) = {
      val p = token.map(_.toInt).getOrElse(0)
      (Seq(item(s"e-$p", p)), Some((p + 1).toString))
    }
  }
}

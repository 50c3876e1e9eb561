package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The result cache must serve hits WITHOUT touching the source data,
  * move its key on any data change (no stale reads), distinguish distinct
  * queries, and prune by recency. */
class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("id", "v").repartition(2)
      .write.mode("overwrite").parquet(dir)

  test("hit serves the materialized result even after the source is gone") {
    val root = Files.createTempDirectory("rescache").toString
    val src = s"$root/t"
    freshTable(src, Seq((1L, "a"), (2L, "b"), (3L, "a")))
    val cache = new ResultCache(spark, s"$root/cache")
    def q = spark.read.parquet(src).groupBy(col("v"))
      .agg(count(lit(1)).as("n")).orderBy(col("v"))
    val first = cache.run(q).collect().map(_.mkString("|")).toSeq
    assert(cache.misses.get() == 1 && cache.hits.get() == 0)
    // second run with identical data: a hit; then prove the hit never
    // reads the source by deleting it outright
    val key = cache.fingerprint(q)
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get(src)).iterator().asScala.toSeq.reverse.foreach(Files.delete(_))
    val served = spark.read.parquet(s"$root/cache/$key")
      .orderBy(col("v")).collect().map(_.mkString("|")).toSeq
    assert(served == first)
  }

  test("any data change moves the key — no stale result can be served") {
    val root = Files.createTempDirectory("rescache2").toString
    val src = s"$root/t"
    freshTable(src, Seq((1L, "a"), (2L, "b")))
    val cache = new ResultCache(spark, s"$root/cache")
    def q = spark.read.parquet(src).agg(sum(col("id")).as("s"))
    assert(cache.run(q).head().getLong(0) == 3L)
    freshTable(src, Seq((1L, "a"), (2L, "b"), (10L, "c")))
    assert(cache.run(q).head().getLong(0) == 13L,
      "data changed but the cache served the old result")
    assert(cache.misses.get() == 2 && cache.hits.get() == 0)
    assert(cache.run(q).head().getLong(0) == 13L)
    assert(cache.hits.get() == 1)
  }

  test("distinct queries over the same table get distinct keys") {
    val root = Files.createTempDirectory("rescache3").toString
    val src = s"$root/t"
    freshTable(src, Seq((1L, "a"), (2L, "b")))
    val cache = new ResultCache(spark, s"$root/cache")
    val a = cache.fingerprint(spark.read.parquet(src).filter(col("id") > 1))
    val b = cache.fingerprint(spark.read.parquet(src).filter(col("id") > 0))
    assert(a != b)
    // and the same query built twice agrees (exprIds canonicalized)
    val c = cache.fingerprint(spark.read.parquet(src).filter(col("id") > 1))
    assert(a == c)
  }

  test("concurrent writers of one key: one publish wins, reads never break") {
    val root = Files.createTempDirectory("rescache5").toString
    val src = s"$root/t"
    freshTable(src, (1L to 200L).map(i => (i, s"v${i % 7}")))
    val cache = new ResultCache(spark, s"$root/cache")
    def q = spark.read.parquet(src).groupBy(col("v"))
      .agg(sum(col("id")).as("s")).orderBy(col("v"))
    val expected = q.collect().map(_.mkString("|")).toSeq
    import java.util.concurrent.Executors
    val pool = Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 8).map(_ => pool.submit(
        new java.util.concurrent.Callable[Seq[String]] {
          def call(): Seq[String] =
            cache.run(q).orderBy(col("v")).collect().map(_.mkString("|")).toSeq
        }))
      futures.foreach(f => assert(f.get() == expected))
    } finally pool.shutdown()
    // exactly one published entry for the key; no orphaned temp dirs
    import scala.jdk.CollectionConverters._
    val entries = Files.list(Paths.get(s"$root/cache")).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(entries.count(!_.startsWith(".")) == 1, s"entries: $entries")
    assert(!entries.exists(_.startsWith(".tmp-")), s"orphaned tmp: $entries")
  }

  test("non-file-backed plans are refused: the key cannot see their data") {
    val root = Files.createTempDirectory("rescache6").toString
    val cache = new ResultCache(spark, s"$root/cache")
    // two DIFFERENT local relations canonicalize to the same plan text
    // with zero input files — caching one would serve it for the other
    val local = Seq((1L, "x")).toDF("id", "v")
    val ex = intercept[IllegalArgumentException](cache.fingerprint(local))
    assert(ex.getMessage.contains("non-file leaves"))
  }

  test("prune keeps the most recently accessed entries") {
    val root = Files.createTempDirectory("rescache4").toString
    val src = s"$root/t"
    freshTable(src, Seq((1L, "a"), (2L, "b")))
    val cache = new ResultCache(spark, s"$root/cache")
    def q(n: Int) = spark.read.parquet(src).filter(col("id") > n)
    (0 to 3).foreach(n => cache.run(q(n)).count())
    Thread.sleep(5)
    cache.run(q(0)).count() // refresh entry 0's access time
    cache.prune(maxEntries = 2)
    import scala.jdk.CollectionConverters._
    val left = Files.list(Paths.get(s"$root/cache")).iterator().asScala
      .count(p => Files.isDirectory(p) && !p.getFileName.toString.startsWith("."))
    assert(left == 2)
    // the refreshed entry survived
    val before = cache.hits.get()
    cache.run(q(0)).count()
    assert(cache.hits.get() == before + 1, "recently-accessed entry was evicted")
  }
}

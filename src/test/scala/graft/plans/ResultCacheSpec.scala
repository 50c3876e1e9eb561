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

  test("queries differing only beyond maxToStringFields get distinct keys") {
    // default spark.sql.debug.maxToStringFields = 25: plain plan toString
    // elides arg lists past 25 to "... N more fields", so two wide
    // projections differing only in an elided column would collide under
    // a truncated-render key
    val root = Files.createTempDirectory("rescache7").toString
    val src = s"$root/t"
    freshTable(src, Seq((1L, "a"), (2L, "b")))
    val cache = new ResultCache(spark, s"$root/cache")
    def wide(last: Int) = spark.read.parquet(src).select(
      (0 until 29).map(i => lit(i).as(s"c$i")) :+ lit(last).as("c_last"): _*)
    val a = cache.fingerprint(wide(1))
    val b = cache.fingerprint(wide(2))
    assert(a != b, "keys collided on a difference past maxToStringFields")
    assert(cache.run(wide(1)).head().getInt(30 - 1) == 1)
    assert(cache.run(wide(2)).head().getInt(30 - 1) == 2,
      "cache served another query's rows")
  }

  test("prune bounds total bytes: a giant entry counts for what it weighs") {
    val root = Files.createTempDirectory("rescache8").toString
    val src = s"$root/t"
    freshTable(src, (1L to 5000L).map(i => (i, s"payload-$i-" + "x" * 50)))
    val cache = new ResultCache(spark, s"$root/cache")
    // giant: a near-input-sized projection; tiny: two scalar rollups
    cache.run(spark.read.parquet(src).select(col("id"), col("v"))).count()
    Thread.sleep(5)
    cache.run(spark.read.parquet(src).agg(sum(col("id")).as("s"))).count()
    Thread.sleep(5)
    cache.run(spark.read.parquet(src).agg(count(lit(1)).as("n"))).count()
    import scala.jdk.CollectionConverters._
    def entries() = Files.list(Paths.get(s"$root/cache")).iterator().asScala
      .filter(p => Files.isDirectory(p) && !p.getFileName.toString.startsWith("."))
      .toSeq
    def bytes(p: java.nio.file.Path) = Files.walk(p).iterator().asScala
      .filter(Files.isRegularFile(_)).map(Files.size(_)).sum
    val sized = entries().map(p => (p, bytes(p)))
    val giant = sized.maxBy(_._2)._2
    val tinies = sized.map(_._2).sorted.dropRight(1)
    assert(giant > tinies.sum * 3, s"fixture regressed: $sized")
    // budget fits both tiny rollups but not the giant projection: entry
    // count alone (3 <= 10) would keep everything — bytes must evict it
    cache.prune(maxEntries = 10, maxBytes = tinies.sum + giant / 2)
    val left = entries()
    assert(left.size == 2, s"left: $left")
    assert(left.map(bytes).sum <= tinies.sum)
  }

  test("a giant NEWEST entry cannot evict older entries that still fit") {
    val root = Files.createTempDirectory("rescache11").toString
    val src = s"$root/t"
    freshTable(src, (1L to 5000L).map(i => (i, s"payload-$i-" + "x" * 50)))
    val cache = new ResultCache(spark, s"$root/cache")
    // two tiny rollups first, the near-input-sized projection LAST (most
    // recently accessed) — the prefix-eviction bug wiped the tinies here
    cache.run(spark.read.parquet(src).agg(sum(col("id")).as("s"))).count()
    Thread.sleep(5)
    cache.run(spark.read.parquet(src).agg(count(lit(1)).as("n"))).count()
    Thread.sleep(5)
    cache.run(spark.read.parquet(src).select(col("id"), col("v"))).count()
    import scala.jdk.CollectionConverters._
    def entries() = Files.list(Paths.get(s"$root/cache")).iterator().asScala
      .filter(p => Files.isDirectory(p) && !p.getFileName.toString.startsWith("."))
      .toSeq
    def bytes(p: java.nio.file.Path) = Files.walk(p).iterator().asScala
      .filter(Files.isRegularFile(_)).map(Files.size(_)).sum
    val sized = entries().map(p => (p, bytes(p)))
    val tinies = sized.map(_._2).sorted.dropRight(1)
    assert(sized.maxBy(_._2)._2 > tinies.sum, s"fixture regressed: $sized")
    // budget holds both tinies but not the giant: the giant (newest) must
    // be the ONLY victim — skipping it, the older entries still fit
    cache.prune(maxEntries = 10, maxBytes = tinies.sum)
    val left = entries()
    assert(left.size == 2, s"older fitting entries were evicted: $left")
    assert(left.map(bytes).sum == tinies.sum)
  }

  test("runCached materializes the CAPPED frame, never the full result") {
    val root = Files.createTempDirectory("rescache12").toString
    val src = s"$root/t"
    freshTable(src, (1L to 5000L).map(i => (i, s"v$i")))
    val s = spark.newSession()
    s.read.parquet(src).createOrReplaceTempView("rc_big")
    val saved = new SavedQueries(s)
    val cache = new ResultCache(s, s"$root/cache")
    saved.save("big", "SELECT id, v FROM rc_big")
    val r = saved.runCached("big", cache, maxRows = 3)
    assert(r.maxRowsReached && r.df.count() == 3)
    import scala.jdk.CollectionConverters._
    val entry = Files.list(Paths.get(s"$root/cache")).iterator().asScala
      .filter(p => Files.isDirectory(p) && !p.getFileName.toString.startsWith("."))
      .toSeq
    assert(entry.size == 1)
    // the cache holds maxRows+1 rows (the truncation sentinel), not 5000
    assert(s.read.parquet(entry.head.toString).count() == 4L,
      "a corpus-sized saved query must cache only the capped rows")
  }

  test("saved-query dashboard runs serve from the cache, capped and guarded") {
    val root = Files.createTempDirectory("rescache10").toString
    val src = s"$root/t"
    freshTable(src, (1L to 50L).map(i => (i, s"v${i % 3}")))
    val s = spark.newSession() // temp views are session-global
    s.read.parquet(src).createOrReplaceTempView("rc_t")
    val saved = new SavedQueries(s)
    val cache = new ResultCache(s, s"$root/cache")
    saved.save("dash", "SELECT v, CAST(count(*) AS BIGINT) AS n FROM rc_t GROUP BY v")
    val r1 = saved.runCached("dash", cache)
    assert(cache.misses.get() == 1 && cache.hits.get() == 0)
    val r2 = saved.runCached("dash", cache)
    assert(cache.hits.get() == 1, "second dashboard read must be a cache hit")
    assert(r1.df.collect().map(_.mkString("|")).sorted.toSeq ==
      r2.df.collect().map(_.mkString("|")).sorted.toSeq)
    // the row cap still applies to served results; a different row budget
    // caches under its own key (the cap is part of the materialized plan)
    val capped = saved.runCached("dash", cache, maxRows = 2)
    assert(capped.maxRowsReached && capped.df.count() == 2)
    assert(cache.misses.get() == 2, "a new row budget is a new key")
    // a data change moves the key: no stale serve. The temp view must be
    // re-registered from a fresh read — a DATASET-backed temp view pins
    // the file listing it was created with, so the overwrite's new files
    // are invisible (and the old ones gone) through the stale view.
    freshTable(src, (1L to 50L).map(i => (i, "w")))
    s.read.parquet(src).createOrReplaceTempView("rc_t")
    val r3 = saved.runCached("dash", cache)
    assert(cache.misses.get() == 3)
    assert(r3.df.collect().map(_.mkString("|")).toSeq == Seq("w|50"))
    // a non-file-backed query falls back to the direct guarded run:
    // caching is an optimization, never a gate
    s.createDataFrame(Seq((1L, "x"))).toDF("id", "v")
      .createOrReplaceTempView("rc_local")
    saved.save("loc", "SELECT v FROM rc_local")
    val misses = cache.misses.get()
    val r4 = saved.runCached("loc", cache)
    assert(r4.df.collect().map(_.getString(0)).toSeq == Seq("x"))
    assert(cache.misses.get() == misses, "refused plans must not touch the cache")
  }

  test("prune sweeps aged orphan tmp dirs but spares fresh in-flight ones") {
    val root = Files.createTempDirectory("rescache9").toString
    val cacheDir = Paths.get(s"$root/cache")
    val cache = new ResultCache(spark, cacheDir.toString)
    // a crashed writer's debris (old) and a live writer's temp (fresh)
    val dead = cacheDir.resolve(".tmp-deadbeef-" + java.util.UUID.randomUUID())
    val live = cacheDir.resolve(".tmp-cafebabe-" + java.util.UUID.randomUUID())
    Files.createDirectories(dead); Files.createDirectories(live)
    Files.write(dead.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    Files.setLastModifiedTime(dead,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 7200000L))
    cache.prune(maxEntries = 10)
    assert(!Files.exists(dead), "aged orphan survived prune")
    assert(Files.exists(live), "fresh in-flight tmp was swept")
  }
}

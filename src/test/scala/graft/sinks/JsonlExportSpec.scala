package graft.sinks

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Sharded JSONL export: loader-side verification matches the manifest,
  * the export round-trips through a JSON reader, and shard membership is
  * deterministic across re-runs (resumable-loader contract). */
class JsonlExportSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"), col("lang"))

  test("export writes shards whose recomputed stats match the manifest") {
    val dir = Files.createTempDirectory("jsonl").toString
    val stats = JsonlExport.export(docs, dir, keyCol = "doc_id", shards = 4)
    assert(stats.map(_.rows).sum == docs.count())
    assert(stats.map(_.shard) == stats.map(_.shard).sorted)
    val recomputed = JsonlExport.verify(spark, dir)
    assert(recomputed == stats)
    val manifest = new String(
      Files.readAllBytes(java.nio.file.Paths.get(dir, "manifest.json")), "UTF-8")
    assert(manifest.contains(""""shards":4"""))
    stats.foreach(s => assert(manifest.contains(s""""checksum":${s.checksum}""")))
  }

  test("the export round-trips through a JSON reader") {
    val dir = Files.createTempDirectory("jsonl").toString
    JsonlExport.export(docs, dir, keyCol = "doc_id", shards = 3)
    val back = spark.read.json(
      spark.read.option("basePath", dir).text(s"$dir/shard=*")
        .select(col("value").as("line")).as[String](org.apache.spark.sql.Encoders.STRING))
    assert(back.count() == docs.count())
    val a = docs.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val b = back.select(col("doc_id"), col("text")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.toSeq == b.toSeq)
  }

  test("manifest matches the written bytes even for a non-deterministic plan") {
    val dir = Files.createTempDirectory("jsonl").toString
    val nondet = docs.withColumn("salt", rand())
    val stats = JsonlExport.export(nondet, dir, keyCol = "doc_id", shards = 3)
    // stats come from the files on disk, so a plan that evaluates
    // differently per job can never publish a lying manifest
    assert(JsonlExport.verify(spark, dir) == stats)
  }

  test("zero-row shards appear as explicit zero-count manifest entries") {
    // 2 rows into 64 shards: most hash buckets get nothing and write no
    // shard=N dir — the manifest must still declare them, zero-counted, so
    // a loader can tell intentionally-empty from missing
    val dir = Files.createTempDirectory("jsonl").toString
    val tiny = docs.limit(2)
    val stats = JsonlExport.export(tiny, dir, keyCol = "doc_id", shards = 64)
    assert(stats.size == 64)
    assert(stats.map(_.shard) == (0 until 64))
    assert(stats.map(_.rows).sum == 2)
    assert(stats.count(_.rows == 0) >= 62)
    // loader-side verify with no explicit count reads shards from manifest
    assert(JsonlExport.verify(spark, dir) == stats)
    // fully-empty export: all shards present, all zero
    val dir2 = Files.createTempDirectory("jsonl").toString
    val none = JsonlExport.export(docs.limit(0), dir2, keyCol = "doc_id", shards = 4)
    assert(none == (0 until 4).map(i => JsonlExport.ShardStat(i, 0L, 0L)))
    assert(JsonlExport.verify(spark, dir2) == none)
  }

  test("stray shard dirs beyond the declared count surface in verify") {
    val dir = Files.createTempDirectory("jsonl").toString
    val stats = JsonlExport.export(docs.limit(10), dir, keyCol = "doc_id", shards = 2)
    // simulate stale data from a larger prior export: a shard=7 dir a
    // loader reading shard=* WOULD ingest
    val stray = java.nio.file.Paths.get(dir, "shard=7")
    Files.createDirectories(stray)
    Files.writeString(stray.resolve("part-stale.txt"), "{\"doc_id\":999}\n")
    val verified = JsonlExport.verify(spark, dir)
    assert(verified.size == 3, "the stray shard must appear, not be projected away")
    assert(verified.map(_.shard).contains(7))
    assert(verified != stats, "verification must disagree with the manifest")
  }

  test("shard membership and checksums are identical across re-exports") {
    val d1 = Files.createTempDirectory("jsonl").toString
    val d2 = Files.createTempDirectory("jsonl").toString
    val s1 = JsonlExport.export(docs, d1, keyCol = "doc_id", shards = 5)
    val s2 = JsonlExport.export(docs.orderBy(rand(7)), d2, keyCol = "doc_id", shards = 5)
    assert(s1 == s2)
  }
}

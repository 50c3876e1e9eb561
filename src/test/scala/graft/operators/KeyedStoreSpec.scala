package graft.operators

import graft.SparkSpec
import java.nio.file.Files

/** KeyedStore.fold: the one-row-per-key store invariant must survive deltas
  * that themselves violate it (within-batch redelivery). */
class KeyedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("kstore").toString + "/store"
    rows.toDF("id", "v").write.parquet(dir)
    dir
  }

  test("a delta carrying one key twice folds to exactly one store row") {
    val dir = newStore(Seq((1L, "one")))
    // doc 42 redelivered twice with different content in the same batch
    KeyedStore.fold(spark, dir,
      Seq((42L, "first"), (42L, "second"), (7L, "seven")).toDF("id", "v"), "id")
    val out = spark.read.parquet(dir).as[(Long, String)].collect().toMap
    assert(out.keySet == Set(1L, 7L, 42L)) // one row per key — never two 42s
    // winner is content-deterministic: replaying the same delta changes nothing
    KeyedStore.fold(spark, dir,
      Seq((42L, "second"), (42L, "first")).toDF("id", "v"), "id")
    val out2 = spark.read.parquet(dir).as[(Long, String)].collect().toMap
    assert(out2(42L) == out(42L))
    assert(spark.read.parquet(dir).count() == 3L)
  }

  test("duplicate keys in a SUPERSEDING delta rewrite to one row") {
    val dir = newStore(Seq((42L, "stale")))
    KeyedStore.fold(spark, dir,
      Seq((42L, "new-a"), (42L, "new-b")).toDF("id", "v"), "id")
    val rows = spark.read.parquet(dir).as[(Long, String)].collect()
    assert(rows.length == 1 && rows.head._1 == 42L && rows.head._2 != "stale")
  }

  test("unchanged replay still append-skips (crash-replay idempotence)") {
    val dir = newStore(Seq((1L, "one"), (2L, "two")))
    KeyedStore.fold(spark, dir, Seq((1L, "one"), (3L, "three")).toDF("id", "v"), "id")
    assert(spark.read.parquet(dir).count() == 3L)
    KeyedStore.fold(spark, dir, Seq((1L, "one"), (3L, "three")).toDF("id", "v"), "id")
    assert(spark.read.parquet(dir).count() == 3L) // replay added nothing
  }

  test("the rewrite swap refuses object-store schemes (no atomic rename)") {
    // the storage contract is POSIX/HDFS atomic directory rename; a store
    // pointed at copy+delete-rename storage must fail LOUDLY, not corrupt
    for (scheme <- Seq("s3a", "s3", "gs", "wasb", "oss")) {
      val e = intercept[RuntimeException](
        KeyedStore.requireAtomicRename(scheme, s"$scheme://bucket/store"))
      assert(e.getMessage.contains("atomic directory rename"))
      assert(e.getMessage.contains("PartitionedStore"),
        "the error must name the safe alternative")
    }
    // rename-safe filesystems pass
    for (scheme <- Seq("file", "hdfs", "viewfs", null))
      KeyedStore.requireAtomicRename(scheme, "/store")
  }
}

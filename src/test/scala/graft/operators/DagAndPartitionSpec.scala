package graft.operators

import graft.SparkSpec
import graft.functions.Converters
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S11 dependency cascade, U5 partitioned merge with pruning, E9 sequence
  * defaulter — the fake-replicator contract tests of the reference
  * (`replicator/fake.rb` pattern). */
class DagAndPartitionSpec extends SparkSpec {
  import spark.implicits._

  // Fake parent/child replicators (reference FakeDependent pattern)
  private val parent = ReplicatorSpec(
    name = "fake_parent_v1", remoteKeyCol = "pid",
    columns = Seq(
      ColumnSpec("pid", StringType, Seq("id")),
      ColumnSpec("updated", LongType, Seq("updated")),
      ColumnSpec("val", StringType, Seq("val"))),
    updateWhere = (t, s) => t("updated") < s("updated"))
  private val child = ReplicatorSpec(
    name = "fake_child_v1", remoteKeyCol = "cid",
    columns = Seq(
      ColumnSpec("cid", StringType, Seq("id")),
      ColumnSpec("derived", StringType, Seq("val"))),
    dependsOn = Some("fake_parent_v1"))

  private class MemStore(spark: SparkSession) extends DependencyDag.TableStore {
    val tables = scala.collection.mutable.Map.empty[String, DataFrame]
    def read(spec: ReplicatorSpec): DataFrame =
      tables.getOrElse(spec.name, Pipeline.emptyTarget(spec, spark))
    def write(spec: ReplicatorSpec, snapshot: DataFrame): Unit =
      tables(spec.name) = snapshot.cache()
  }

  private def whDf(bodies: Seq[String]) =
    bodies.zipWithIndex.map { case (b, i) => (b, i.toLong) }
      .toDF("body", Projection.IngestSeqCol)

  test("topo order puts parents first; cycles detected") {
    val ordered = DependencyDag.topoOrder(Seq(child, parent)).map(_.name)
    assert(ordered == Seq("fake_parent_v1", "fake_child_v1"))
    val a = parent.copy(name = "a", dependsOn = Some("b"))
    val b = parent.copy(name = "b", dependsOn = Some("a"))
    assertThrows[IllegalArgumentException](DependencyDag.topoOrder(Seq(a, b)))
  }

  test("cascade: child upserts derive from parent's CHANGED rows only") {
    val store = new MemStore(spark)
    def childBatch(c: ReplicatorSpec, changed: DataFrame): DataFrame =
      changed.select(
        to_json(struct(col("pid").as("id"), col("val"))).as("body"),
        col("updated").as(Projection.IngestSeqCol))

    DependencyDag.cascade(Seq(parent, child), "fake_parent_v1",
      whDf(Seq("""{"id":"p1","updated":10,"val":"a"}""",
        """{"id":"p2","updated":10,"val":"b"}""")),
      store, childBatch)
    assert(store.tables("fake_parent_v1").count() == 2)
    assert(store.tables("fake_child_v1").count() == 2)

    // second batch: p1 newer (propagates), p2 stale (must NOT propagate)
    DependencyDag.cascade(Seq(parent, child), "fake_parent_v1",
      whDf(Seq("""{"id":"p1","updated":20,"val":"a2"}""",
        """{"id":"p2","updated":5,"val":"stale"}""")),
      store, childBatch)
    val childRows = store.tables("fake_child_v1")
      .select("cid", "derived").as[(String, String)].collect().toMap
    assert(childRows("p1") == "a2")  // propagated
    assert(childRows("p2") == "b")   // stale parent update suppressed
  }

  test("partitioned merge rewrites only touched buckets and prunes the scan") {
    val dir = java.nio.file.Files.createTempDirectory("pstore").toString
    val base = (1 to 100).map(i => (s"key-$i", i.toLong)).toDF("k", "v")
    PartitionedStore.write(base, dir, "k", buckets = 8)

    val before = PartitionedStore.read(spark, dir)
    assert(before.select(PartitionedStore.BucketCol).distinct().count() == 8)

    // merge a small batch: only its buckets flip to the new epoch
    val batch = Seq(("key-1", 999L), ("new-key", 1L)).toDF("k", "v")
    val touched = PartitionedStore.withBucket(batch, "k", 8)
      .select(PartitionedStore.BucketCol).distinct().as[Int].collect().toSet
    val untouched = (0 until 8).toSet -- touched
    val manifestBefore = PartitionedStore.currentManifest(dir).get

    PartitionedStore.mergeInto(spark, dir, batch,
      MergeSpec(Seq("k"), orderCol = "v"), "k", buckets = 8)

    val after = PartitionedStore.read(spark, dir)
    assert(after.count() == 101)
    assert(after.filter(col("k") === "key-1").select("v").as[Long].collect()(0) == 999L)
    // untouched buckets keep their old epoch (their files were not rewritten)
    val manifestAfter = PartitionedStore.currentManifest(dir).get
    assert(manifestAfter.version == manifestBefore.version + 1)
    untouched.foreach(b =>
      assert(manifestAfter.buckets(b) == manifestBefore.buckets(b)))
    touched.foreach(b =>
      assert(manifestAfter.buckets(b) == manifestAfter.version))
    // scanning one bucket prunes partitions at the source
    val pruned = after.filter(col(PartitionedStore.BucketCol) === touched.head)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || pruned.count() < 101)
  }

  test("multi-bucket commit is atomic: uncommitted epochs invisible, vacuum reclaims") {
    val dir = java.nio.file.Files.createTempDirectory("pstore-atomic").toString
    val base = (1 to 40).map(i => (s"key-$i", i.toLong)).toDF("k", "v")
    PartitionedStore.write(base, dir, "k", buckets = 4)
    val v1 = PartitionedStore.currentManifest(dir).get

    // simulate a crash mid-merge: epoch data fully written, manifest never
    // published (the only window the protocol leaves open)
    val orphan = PartitionedStore.withBucket(
      Seq(("key-1", 777L)).toDF("k", "v"), "k", 4)
    orphan.write.mode("overwrite")
      .partitionBy(PartitionedStore.BucketCol).parquet(s"$dir/e${v1.version + 1}")

    // readers still see the committed snapshot, not a half-applied merge
    val seen = PartitionedStore.read(spark, dir)
    assert(seen.count() == 40)
    assert(seen.filter(col("k") === "key-1").select("v").as[Long].collect()(0) == 1L)
    assert(PartitionedStore.currentManifest(dir).get == v1)

    // the retry reuses the orphaned epoch number, overwrites its data, and
    // the manifest publish is what makes the merge visible
    PartitionedStore.mergeInto(spark, dir, Seq(("key-1", 888L)).toDF("k", "v"),
      MergeSpec(Seq("k"), orderCol = "v"), "k", buckets = 4)
    val healed = PartitionedStore.read(spark, dir)
    assert(healed.filter(col("k") === "key-1").select("v").as[Long].collect()(0) == 888L)
    assert(healed.count() == 40)

    // compact folds live epochs into one; vacuum with zero retention
    // removes all superseded history (default retention keeps the
    // time-travel window — see the readAt test)
    PartitionedStore.compact(spark, dir)
    val compacted = PartitionedStore.currentManifest(dir).get
    assert(compacted.epochDirs.size == 1)
    val removed = PartitionedStore.vacuum(dir, retain = 0)
    assert(removed.nonEmpty)
    val afterVacuum = PartitionedStore.read(spark, dir)
    assert(afterVacuum.count() == 40)
    assert(afterVacuum.filter(col("k") === "key-1")
      .select("v").as[Long].collect()(0) == 888L)
  }

  test("readAt time-travels across retained versions; vacuum honors the window") {
    val dir = java.nio.file.Files.createTempDirectory("pstore-tt").toString
    PartitionedStore.write(Seq(("key-1", 1L), ("key-2", 2L)).toDF("k", "v"),
      dir, "k", buckets = 4)
    PartitionedStore.mergeInto(spark, dir, Seq(("key-1", 10L)).toDF("k", "v"),
      MergeSpec(Seq("k"), orderCol = "v"), "k", buckets = 4)
    PartitionedStore.mergeInto(spark, dir, Seq(("key-3", 30L)).toDF("k", "v"),
      MergeSpec(Seq("k"), orderCol = "v"), "k", buckets = 4)
    val vs = PartitionedStore.versions(dir)
    assert(vs.size == 3)
    def valueOf(df: org.apache.spark.sql.DataFrame, k: String): Option[Long] =
      df.filter(col("k") === k).select("v").as[Long].collect().headOption
    // default vacuum keeps every retained version readable
    PartitionedStore.vacuum(dir)
    assert(valueOf(PartitionedStore.readAt(spark, dir, vs(0)), "key-1").contains(1L))
    assert(valueOf(PartitionedStore.readAt(spark, dir, vs(0)), "key-3").isEmpty)
    assert(valueOf(PartitionedStore.readAt(spark, dir, vs(1)), "key-1").contains(10L))
    assert(valueOf(PartitionedStore.readAt(spark, dir, vs(2)), "key-3").contains(30L))
    // diff between versions: v1->v2 changed key-1; v2->v3 added key-3
    val d12 = PartitionedStore.diff(spark, dir, vs(0), vs(1), Seq("k"))
      .as[(String, String)].collect().toSet
    assert(d12 == Set(("key-1", "changed")))
    val d13 = PartitionedStore.diff(spark, dir, vs(0), vs(2), Seq("k"))
      .as[(String, String)].collect().toSet
    assert(d13 == Set(("key-1", "changed"), ("key-3", "added")))
    val d31 = PartitionedStore.diff(spark, dir, vs(2), vs(0), Seq("k"))
      .as[(String, String)].collect().toSet
    assert(d31 == Set(("key-1", "changed"), ("key-3", "removed")))

    // zero-retention vacuum collapses the window; old versions are gone
    PartitionedStore.vacuum(dir, retain = 0)
    assert(PartitionedStore.versions(dir) == Seq(vs(2)))
    intercept[IllegalArgumentException] {
      PartitionedStore.readAt(spark, dir, vs(0))
    }
    assert(valueOf(PartitionedStore.read(spark, dir), "key-1").contains(10L))
  }

  test("diff between adjacent versions reads only buckets whose epoch changed") {
    val dir = java.nio.file.Files.createTempDirectory("pstore-diff").toString
    val base = (1 to 200).map(i => (s"key-$i", i.toLong)).toDF("k", "v")
    PartitionedStore.write(base, dir, "k", buckets = 16)
    // one merge touching a single key -> 1 bucket flips epoch, 15 stay put
    PartitionedStore.mergeInto(spark, dir, Seq(("key-1", 999L)).toDF("k", "v"),
      MergeSpec(Seq("k"), orderCol = "v"), "k", buckets = 16)
    val vs = PartitionedStore.versions(dir)

    val (rows, m) = graft.plans.QueryMetrics.measureAction(spark)(
      PartitionedStore.diff(spark, dir, vs(0), vs(1), Seq("k")).collect())
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("key-1", "changed")))
    // pruning proof: both sides together read only the changed bucket's
    // rows (~200/16 each side), nowhere near the 400 a full two-sided
    // compare scans
    assert(m.inputRecords > 0)
    assert(m.inputRecords < 100,
      s"diff should read only changed buckets, read ${m.inputRecords} records")
    val (_, full) = graft.plans.QueryMetrics.measureAction(spark)(
      (PartitionedStore.readAt(spark, dir, vs(0)).collect(),
        PartitionedStore.readAt(spark, dir, vs(1)).collect()))
    assert(full.inputRecords >= 400,
      s"baseline full scan reads everything, read ${full.inputRecords}")

    // identical versions: zero buckets differ, zero rows read, empty diff
    val (same, mSame) = graft.plans.QueryMetrics.measureAction(spark)(
      PartitionedStore.diff(spark, dir, vs(1), vs(1), Seq("k")).collect())
    assert(same.isEmpty)
    assert(mSame.inputRecords == 0,
      s"self-diff must read nothing, read ${mSame.inputRecords}")
  }

  test("maybeCompact folds only past the epoch-depth threshold") {
    val dir = java.nio.file.Files.createTempDirectory("pstore-mc").toString
    PartitionedStore.write(Seq(("key-1", 1L)).toDF("k", "v"), dir, "k", buckets = 2)
    (2 to 3).foreach(i => PartitionedStore.mergeInto(spark, dir,
      Seq((s"key-$i", i.toLong)).toDF("k", "v"),
      MergeSpec(Seq("k"), orderCol = "v"), "k", buckets = 2))
    // epoch depth is 2 or 3 depending on which buckets the keys hash into
    val depth = PartitionedStore.currentManifest(dir).get.epochDirs.size
    assert(depth >= 2)
    assert(!PartitionedStore.maybeCompact(spark, dir, maxEpochs = 8))
    assert(PartitionedStore.currentManifest(dir).get.epochDirs.size == depth)
    assert(PartitionedStore.maybeCompact(spark, dir, maxEpochs = 1))
    assert(PartitionedStore.currentManifest(dir).get.epochDirs.size == 1)
    assert(PartitionedStore.read(spark, dir).count() == 3)
  }

  test("empty snapshot commits with schema; vacuum keeps it and prunes manifests") {
    val dir = java.nio.file.Files.createTempDirectory("pstore-empty").toString
    val empty = Seq.empty[(String, Long)].toDF("k", "v")
    PartitionedStore.write(empty, dir, "k", buckets = 4)
    val seen = PartitionedStore.read(spark, dir)
    assert(seen.count() == 0)
    assert(seen.columns.toSet == Set("k", "v", PartitionedStore.BucketCol))
    // vacuum must not reclaim the schema-bearing epoch of the empty snapshot
    PartitionedStore.vacuum(dir)
    assert(PartitionedStore.read(spark, dir).count() == 0)
    // merging into the empty snapshot works and manifests prune past retention
    (1 to PartitionedStore.ManifestRetention + 4).foreach { i =>
      PartitionedStore.mergeInto(spark, dir, Seq((s"key-$i", i.toLong)).toDF("k", "v"),
        MergeSpec(Seq("k"), orderCol = "v"), "k", buckets = 4)
    }
    PartitionedStore.vacuum(dir)
    val manifests = new java.io.File(s"$dir/_manifest").list().count(_.endsWith(".json"))
    assert(manifests == PartitionedStore.ManifestRetention + 1)
    assert(PartitionedStore.read(spark, dir).count() ==
      PartitionedStore.ManifestRetention + 4)
  }

  test("E9 sequence defaulter: captures when present, unique surrogates otherwise") {
    val df = Seq("ep-7", "none", "other", "ep-9").toDF("s")
      .withColumn("id", Converters.intOrSequenceFromRegex(col("s"), "ep-(\\d+)", 1000000L))
    val got = df.select("s", "id").as[(String, Long)].collect().toMap
    assert(got("ep-7") == 7L && got("ep-9") == 9L)
    val surrogates = Seq(got("none"), got("other"))
    assert(surrogates.forall(_ >= 1000000L))
    assert(surrogates.distinct.size == 2)
  }
}

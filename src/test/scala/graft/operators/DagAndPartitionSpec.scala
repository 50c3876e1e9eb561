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

    // merge a small batch: only its buckets get rewritten
    val batch = Seq(("key-1", 999L), ("new-key", 1L)).toDF("k", "v")
    val touched = PartitionedStore.withBucket(batch, "k", 8)
      .select(PartitionedStore.BucketCol).distinct().as[Int].collect().toSet
    val untouched = (0 until 8).toSet -- touched
    val fileBefore = untouched.map(b =>
      new java.io.File(s"$dir/${PartitionedStore.BucketCol}=$b").lastModified())

    PartitionedStore.mergeInto(spark, dir, batch,
      MergeSpec(Seq("k"), orderCol = "v"), "k", buckets = 8)

    val after = PartitionedStore.read(spark, dir)
    assert(after.count() == 101)
    assert(after.filter(col("k") === "key-1").select("v").as[Long].collect()(0) == 999L)
    // untouched bucket directories were not rewritten
    val fileAfter = untouched.map(b =>
      new java.io.File(s"$dir/${PartitionedStore.BucketCol}=$b").lastModified())
    assert(fileBefore == fileAfter)
    // scanning one bucket prunes partitions at the source
    val pruned = after.filter(col(PartitionedStore.BucketCol) === touched.head)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || pruned.count() < 101)
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

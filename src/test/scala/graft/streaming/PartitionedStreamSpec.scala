package graft.streaming

import graft.SparkSpec
import graft.operators.PartitionedStore
import graft.replicators.Replicators
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** U5 + S1 at scale: streaming microbatches merge into the hash-partitioned
  * table, rewriting only touched buckets. */
class PartitionedStreamSpec extends SparkSpec {

  private def charge(id: String, amount: Int, created: Long) =
    s"""{"id":"$id","object":"charge","amount":$amount,"created":$created,"status":"ok"}"""
  private def event(resource: String, created: Long, seq: Long) = {
    val body = s"""{"object":"event","created":$created,"data":{"object":$resource}}"""
      .replace("\"", "\\\"")
    s"""{"body":"$body","headers":{},"path":"/v1","method":"POST","__ingest_seq":$seq}"""
  }

  test("streaming merge into partitioned table updates only touched buckets") {
    val dir = Files.createTempDirectory("pstream").toString
    val src = s"$dir/src"; Files.createDirectories(Paths.get(src))
    val spec = Replicators.stripeChargeV1
    val table = s"$dir/table"

    // batch 1: bootstrap 20 charges
    Files.writeString(Paths.get(src, "b1.json"),
      (1 to 20).map(i => event(charge(s"ch_$i", i, 1000 + i), 1000 + i, i)).mkString("\n"))
    val q1 = WebhookStream.startPartitioned(spark, spec, src, table, s"$dir/chk", buckets = 4)
    q1.awaitTermination()
    val t1 = PartitionedStore.read(spark, table)
    assert(t1.count() == 20)
    assert(t1.select(PartitionedStore.BucketCol).distinct().count() == 4)

    // batch 2: update ch_1 (newer), stale ch_2 (suppressed), insert ch_99
    Files.writeString(Paths.get(src, "b2.json"),
      Seq(event(charge("ch_1", 111, 9999), 9999, 100),
        event(charge("ch_2", 222, 1), 1, 101),
        event(charge("ch_99", 99, 500), 500, 102)).mkString("\n"))
    val q2 = WebhookStream.startPartitioned(spark, spec, src, table, s"$dir/chk", buckets = 4)
    q2.awaitTermination()

    val t2 = PartitionedStore.read(spark, table)
    assert(t2.count() == 21)
    val amounts = t2.select("stripe_id", "amount")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(amounts("ch_1") == 111L) // newer update applied
    assert(amounts("ch_2") == 2L)   // stale suppressed by update_where
    assert(amounts("ch_99") == 99L) // insert landed in its bucket
  }

  test("start() routes partitioned specs to the bucket-pruned path by default") {
    val dir = Files.createTempDirectory("proute").toString
    val src = s"$dir/src"; Files.createDirectories(Paths.get(src))
    Files.writeString(Paths.get(src, "b1.json"),
      (1 to 8).map(i => event(charge(s"ch_$i", i, 1000 + i), 1000 + i, i)).mkString("\n"))

    // partitioned spec -> PartitionedStore layout (bucket column, no LATEST)
    val pSpec = Replicators.stripeChargeV1
      .copy(name = "stripe_charge_route_p", partitioned = true)
    WebhookStream.start(spark, pSpec, src, s"$dir/pt", s"$dir/pchk", buckets = 4)
      .awaitTermination()
    val pt = PartitionedStore.read(spark, s"$dir/pt")
    assert(pt.columns.contains(PartitionedStore.BucketCol))
    assert(pt.count() == 8)
    assert(!Files.exists(Paths.get(s"$dir/pt", "LATEST")))

    // plain spec -> versioned snapshot with a LATEST pointer (small tables)
    WebhookStream.start(spark, Replicators.stripeChargeV1, src,
        s"$dir/st", s"$dir/schk")
      .awaitTermination()
    assert(Files.exists(Paths.get(s"$dir/st", "LATEST")))
    assert(new SnapshotStore(s"$dir/st").readOr(sys.error("missing")).count() == 8)
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** §2.11 replay filter: cross-batch keyed state drops redelivered rows;
  * new sequences pass; correctness backstop (the merge) untouched. */
class StatefulDedupSpec extends SparkSpec {
  import spark.implicits._

  test("replays below the per-key high-water seq are dropped across batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, String)]

    val q = StatefulDedup.dropReplays(input.toDS(), idleTimeout = None)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Long, String)], _: Long) =>
        out.synchronized { out ++= batch.collect() }; ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sdchk").toString)
      .start()

    input.addData(("k1", 1L, "a"), ("k1", 2L, "b"), ("k2", 5L, "x"),
      ("k1", 2L, "b-dup")) // in-batch replay of seq 2
    q.processAllAvailable()
    input.addData(("k1", 2L, "b-replay"), ("k1", 1L, "a-replay"), // cross-batch replays
      ("k1", 3L, "c"), ("k2", 4L, "stale"), ("k3", 1L, "new"))
    q.processAllAvailable()
    q.stop()

    val got = out.sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      ("k1", 1L, "a"), ("k1", 2L, "b"), ("k1", 3L, "c"),
      ("k2", 5L, "x"), ("k3", 1L, "new")))
  }
}

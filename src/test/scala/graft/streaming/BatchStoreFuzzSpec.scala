package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import java.nio.file.{Files, Paths}

/** Randomized fuzzing of the streaming replay-safety core — the
  * [[BatchStore]] analogue of the stateful store fuzz. A seeded schedule
  * interleaves, in random order:
  *
  *  - delivery of new microbatches (additive CMS-like deltas),
  *  - REPLAYS of the current max batch (the one batch foreachBatch's
  *    at-least-once contract can redeliver — including immediately after
  *    a history collapse, the exact window the [[BatchStore.HistoryBatch]]
  *    sentinel exists to protect),
  *  - `collapseHistory` compactions,
  *  - manufactured CRASH STATES of the rewrite swap: the post-delete
  *    window (live dir gone, completed `.rewrite` sibling waiting — the
  *    state `recover` must promote) and the pre-delete window (live dir
  *    intact, stale partial sibling — the state `recover` must discard),
  *
  * and checks after every operation that the merged read equals the
  * additive model (per-key sum over every DELIVERED delta — replays,
  * collapses, and crash recoveries must all be invisible to it).
  * Deterministic per seed; failures print the schedule. */
class BatchStoreFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("n", LongType),
    StructField("ingest_batch", LongType)))

  private def df(rows: Seq[(String, Long)]): DataFrame = rows.toDF("k", "n")

  private def merged(dir: String): Map[String, Long] =
    BatchStore.read(spark, dir, schema)
      .groupBy("k").agg(sum("n").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def collapse(dir: String): Unit =
    BatchStore.collapseHistory(spark, dir, schema) { hist =>
      hist.groupBy("k").agg(sum("n").as("n"))
    }

  for (seed <- Seq(7L, 19L)) {
    test(s"replay/collapse/crash schedule keeps the merged read additive (seed $seed)") {
      val r = new java.util.Random(seed)
      val dir = Files.createTempDirectory("batchfuzz").toString + "/store"
      val keys = (0 until 12).map(i => s"k$i")
      var delivered = Map.empty[Long, Seq[(String, Long)]]
      var nextBatch = 0L
      var steps = List.empty[String]
      def ctx = s"seed=$seed schedule=${steps.reverse.mkString(",")}"
      def model: Map[String, Long] = delivered.values.flatten
        .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
      def check(): Unit =
        assert(merged(dir) == model, s"$ctx: merged read != additive model")

      for (_ <- 0 until 16) {
        r.nextInt(8) match {
          case 0 | 1 | 2 => // deliver a new microbatch
            val delta = (0 until r.nextInt(4) + 1)
              .map(_ => (keys(r.nextInt(keys.size)), r.nextInt(9) + 1L))
            BatchStore.writePartition(df(delta), nextBatch, dir)
            delivered += nextBatch -> delta
            steps ::= s"deliver$nextBatch"
            nextBatch += 1
            check()
          case 3 | 4 if delivered.nonEmpty => // redeliver the current max batch
            val b = delivered.keys.max
            BatchStore.writePartition(df(delivered(b)), b, dir)
            steps ::= s"replay$b"
            check()
          case 5 =>
            collapse(dir)
            steps ::= "collapse"
            check()
          case 6 if Files.isDirectory(Paths.get(dir)) &&
              !Files.exists(Paths.get(dir + ".rewrite")) =>
            // post-delete crash window: live dir gone, completed rewrite
            // sibling waiting — every entry point must heal this first
            Files.move(Paths.get(dir), Paths.get(dir + ".rewrite"))
            steps ::= "crashSwap"
            check() // read() recovers, then must see the full store
          case 7 if Files.isDirectory(Paths.get(dir)) &&
              !Files.exists(Paths.get(dir + ".rewrite")) =>
            // pre-delete crash window: live dir intact, STALE partial
            // sibling — recover must discard it, never promote it
            df(Seq(("stale", 999L))).withColumn("ingest_batch", lit(0L))
              .write.partitionBy("ingest_batch").parquet(dir + ".rewrite")
            steps ::= "staleSibling"
            check()
          case _ => ()
        }
      }
      // a collapse at the very end, then one more replay of the max batch:
      // the sentinel discipline's sharpest edge, explicitly
      if (delivered.nonEmpty) {
        collapse(dir)
        val b = delivered.keys.max
        BatchStore.writePartition(df(delivered(b)), b, dir)
        steps ::= "collapse+replayMax"
        check()
      }
    }
  }
}

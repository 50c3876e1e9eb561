package graft.streaming

import graft.SparkSpec
import graft.operators.IncrementalSubstr
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The stream-maintained substring ledger must equal the batch report
  * over everything streamed so far, serve the admission probe
  * mid-stream, and heal replayed microbatch schedules (the StoreFuzzSpec
  * pattern applied at the streaming layer — crashed foreachBatch
  * attempts redeliver the SAME batch id + content). */
class SubstrStreamSpec extends SparkSpec {
  import spark.implicits._

  // 40-char span shared across batches: its second arrival must reach
  // back and recompute the FIRST batch's holder through the stream path
  private val S = "the quick brown fox jumps over the dogsx"
  private def doc(i: Long): (Long, String) = i match {
    case 1L => 1L -> s"aaaa bbbb cccc $S dddd eeee ffff"
    case 20L => 20L -> s"gggg hhhh iiii jjjj $S kkkk llll"
    // every token carries n, so no 32-char window is shared across docs
    // (a shared plain-word prefix would put legitimate counts above 2
    // and break the replay-inflation assertion below)
    case n => n -> Seq("unique", "material", "for", "document", "number",
      "with", "nothing", "shared").map(w => s"$w$n").mkString(" ")
  }

  private def rows(d: DataFrame): Seq[(Long, Long, Long, Long)] =
    d.select(col("doc_id"), col("n_spans"), col("dup_chars"), col("kept_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  private def batchOver(ids: Seq[Long]): Seq[(Long, Long, Long, Long)] =
    rows(IncrementalSubstr.batchReport(
      ids.map(doc).toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), length(col("text")).as("len"))))

  test("streamed rounds equal batch; probe and report served mid-stream") {
    val root = java.nio.file.Files.createTempDirectory("substrstream").toString
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = SubstrStream.start(input.toDS().toDF("doc_id", "text"),
      s"$root/store", s"$root/chk")
    try {
      input.addData(doc(1L), doc(2L))
      q.processAllAvailable()
      // mid-stream: report over batch 0 only, and a probe carrying the
      // second copy of S must surface the span (read-only, store intact)
      assert(rows(SubstrStream.report(spark, s"$root/store")) == batchOver(Seq(1L, 2L)))
      val probed = rows(SubstrStream.probe(spark, s"$root/store",
        Seq(900L -> s"pp $S qq").toDF("doc_id", "text")))
      assert(probed.head._2 == 1L, s"mid-stream probe must find the span: $probed")
      // batch 1 delivers the second S copy: the stream's round must
      // recompute batch 0's holder (doc 1), not just the arrival
      input.addData(doc(20L), doc(21L))
      q.processAllAvailable()
    } finally q.stop()
    val got = rows(SubstrStream.report(spark, s"$root/store"))
    assert(got == batchOver(Seq(1L, 2L, 20L, 21L)))
    assert(got.find(_._1 == 1L).get._2 == 1L,
      "the batch-0 holder's span must appear after the cross-batch flip")
  }

  Seq(11L, 22L).foreach { seed =>
    test(s"replayed microbatch schedule equals batch oracle (seed $seed)") {
      val r = new java.util.Random(seed)
      val root = java.nio.file.Files.createTempDirectory("substrstreamfz").toString + "/store"
      val deltas = Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(20L), Seq(5L, 21L))
      var done = 0
      var steps = List.empty[String]
      def check(): Unit = {
        val got = rows(SubstrStream.report(spark, root))
        val want = batchOver(deltas.take(done).flatten)
        assert(got == want,
          s"schedule=${steps.reverse.mkString(",")}: $got != $want")
      }
      while (done < deltas.size) {
        r.nextInt(3) match {
          case 0 | 1 => // deliver the next microbatch
            SubstrStream.runBatch(spark,
              deltas(done).map(doc).toDF("doc_id", "text"), done.toLong, root)
            done += 1; steps ::= s"b${done - 1}"
            check()
          case _ if done > 0 => // crashed-attempt redelivery of an EARLIER
            // batch: same id, same content — both layers must heal
            val j = r.nextInt(done)
            SubstrStream.runBatch(spark,
              deltas(j).map(doc).toDF("doc_id", "text"), j.toLong, root)
            steps ::= s"replay$j"
            check()
          case _ => ()
        }
      }
      // ledger never double-counted across the replays: no window count
      // above 2 exists in this corpus (S appears exactly twice)
      val maxCount = spark.read.parquet(s"$root/wins")
        .groupBy("w").agg(sum("n").as("n")).agg(max("n")).head().getLong(0)
      assert(maxCount <= 2L, s"replays inflated a window count to $maxCount")
    }
  }
}

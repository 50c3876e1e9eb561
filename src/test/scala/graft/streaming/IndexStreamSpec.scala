package graft.streaming

import graft.SparkSpec
import graft.queries.PipelineQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The stream-maintained inverted index must equal the batch q181 build
  * over everything streamed so far, serve BM25 search mid-stream, and
  * heal replayed microbatch schedules — the marker-commit protocol doing
  * at the streaming layer what SubstrStream/BandIndexStream buy with
  * their own replay disciplines. */
class IndexStreamSpec extends SparkSpec {
  import spark.implicits._

  private def doc(i: Long): (Long, String) =
    i -> (Seq("shared", "corpus", "terms") ++
      Seq("unique", "material", "for", "doc").map(w => s"$w$i")).mkString(" ")

  private def statRows(d: DataFrame): Seq[(String, Long, Long, Long)] =
    d.select(col("word"), col("df"), col("cf"), col("postings_sig"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  private def batchOver(ids: Seq[Long]): Seq[(String, Long, Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("idxstreamoracle").toString
    ids.map(doc).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    statRows(PipelineQueries.q181(spark, dir))
  }

  test("streamed batches equal the batch index; search served mid-stream") {
    val root = java.nio.file.Files.createTempDirectory("idxstream").toString
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = IndexStream.start(input.toDS().toDF("doc_id", "text"),
      s"$root/store", s"$root/chk")
    try {
      input.addData(doc(1L), doc(2L))
      q.processAllAvailable()
      assert(statRows(IndexStream.stats(spark, s"$root/store")) ==
        batchOver(Seq(1L, 2L)))
      // mid-stream search over the live store: both docs carry "shared"
      val hits = IndexStream.search(spark, s"$root/store", Seq("shared"), 10)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(hits == Set(1L, 2L), s"mid-stream search: $hits")
      input.addData(doc(3L), doc(4L))
      q.processAllAvailable()
    } finally q.stop()
    assert(statRows(IndexStream.stats(spark, s"$root/store")) ==
      batchOver(Seq(1L, 2L, 3L, 4L)))
  }

  Seq(7L, 31L).foreach { seed =>
    test(s"replayed microbatch schedule equals batch oracle (seed $seed)") {
      val r = new java.util.Random(seed)
      val root = java.nio.file.Files.createTempDirectory("idxstreamfz").toString + "/store"
      val deltas = Seq(Seq(1L, 2L), Seq(3L), Seq(4L, 5L), Seq(6L))
      var done = 0
      var steps = List.empty[String]
      def check(): Unit = {
        val got = statRows(IndexStream.stats(spark, root))
        val want = batchOver(deltas.take(done).flatten)
        assert(got == want, s"schedule=${steps.reverse.mkString(",")}")
      }
      while (done < deltas.size) {
        r.nextInt(3) match {
          case 0 | 1 =>
            IndexStream.runBatch(spark,
              deltas(done).map(doc).toDF("doc_id", "text"), done.toLong, root)
            done += 1; steps ::= s"b${done - 1}"
            check()
          case _ if done > 0 =>
            val j = r.nextInt(done)
            IndexStream.runBatch(spark,
              deltas(j).map(doc).toDF("doc_id", "text"), j.toLong, root)
            steps ::= s"replay$j"
            check()
          case _ => ()
        }
      }
    }
  }
}

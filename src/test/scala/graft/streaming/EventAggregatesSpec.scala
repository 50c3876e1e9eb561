package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** Watermarked windowed aggregation: append-mode emission of closed windows
  * only; late-but-within-watermark events still count. */
class EventAggregatesSpec extends SparkSpec {

  test("tumbling windows with watermark emit closed windows under append mode") {
    val dir = Files.createTempDirectory("evagg").toString
    val src = s"$dir/src"; Files.createDirectories(Paths.get(src))
    def line(ts: String, tpe: String, v: Double) =
      s"""{"ts":"$ts","event_type":"$tpe","value":$v}"""
    Files.writeString(Paths.get(src, "b1.json"),
      Seq(
        line("2024-01-01T00:00:10", "click", 1.0),
        line("2024-01-01T00:00:40", "click", 2.0),
        line("2024-01-01T00:01:10", "view", 3.0),
        line("2024-01-01T00:00:55", "click", 4.0), // late but within watermark
        line("2024-01-01T00:10:00", "view", 5.0)   // advances watermark far ahead
      ).mkString("\n"))

    val stream = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
      .json(src)
    val agg = EventAggregates.windowedTypeStats(stream, "1 minute", "1 minute", "2 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("evagg_out")
      .option("checkpointLocation", s"$dir/chk")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val out = spark.table("evagg_out")
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start").toString,
        r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
      .toSet
    // windows <= watermark (00:08) are closed and emitted; the 00:10 window is still open
    assert(out.contains(("2024-01-01 00:00:00.0", "click", 3L, 7.0)))
    assert(out.contains(("2024-01-01 00:01:00.0", "view", 1L, 3.0)))
    assert(!out.exists(_._1.startsWith("2024-01-01 00:10")))
  }

  test("the same aggregation runs identically as a batch plan") {
    import spark.implicits._
    val batch = Seq(
      ("2024-01-01 00:00:10", "click", 1.0),
      ("2024-01-01 00:00:40", "click", 2.0))
      .toDF("ts_s", "event_type", "value")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts_s").cast("timestamp"))
    val got = EventAggregates.windowedTypeStats(batch, "1 minute", "1 minute", "2 minutes")
      .collect()(0)
    assert(got.getAs[Long]("n") == 2L)
    assert(got.getAs[Double]("sum_value") == 3.0)
  }
}

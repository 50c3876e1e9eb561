package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** Session windows, watermark-bounded dedup, and the stream-stream interval
  * join: append-mode emission, state bounded by the watermark in all three. */
class SessionStreamSpec extends SparkSpec {

  private def writeEvents(src: String, name: String, lines: Seq[String]): Unit =
    Files.writeString(Paths.get(src, name), lines.mkString("\n"))

  private def line(ts: String, user: Long, tpe: String, v: Double) =
    s"""{"ts":"$ts","user_id":$user,"event_type":"$tpe","value":$v}"""

  test("session_window merges gap-contiguous events and closes on watermark") {
    val dir = Files.createTempDirectory("sess").toString
    val src = s"$dir/src"; Files.createDirectories(Paths.get(src))
    writeEvents(src, "b1.json", Seq(
      line("2024-01-01T00:00:00", 1, "click", 1.0),
      line("2024-01-01T00:03:00", 1, "click", 2.0),  // within 5m gap -> same session
      line("2024-01-01T00:20:00", 1, "click", 4.0),  // new session
      line("2024-01-01T00:02:00", 2, "view", 8.0),
      line("2024-01-01T02:00:00", 9, "tick", 0.0)))  // advances watermark, closes all

    val stream = spark.readStream
      .schema("ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .json(src)
    val q = SessionWindows.userSessions(stream, "5 minutes", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .option("checkpointLocation", s"$dir/chk")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val out = spark.table("sess_out").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("session_start").toString,
        r.getAs[java.sql.Timestamp]("session_end").toString,
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    // user 1 session A: events at 00:00 and 00:03 merge; ends 00:03 + gap
    assert(out.contains((1L, "2024-01-01 00:00:00.0", "2024-01-01 00:08:00.0", 2L, 3.0)))
    // user 1 session B: the 00:20 event alone
    assert(out.contains((1L, "2024-01-01 00:20:00.0", "2024-01-01 00:25:00.0", 1L, 4.0)))
    assert(out.exists(_._1 == 2L))
  }

  test("dropDuplicatesWithinWatermark keeps the first replay only") {
    val dir = Files.createTempDirectory("dd").toString
    val src = s"$dir/src"; Files.createDirectories(Paths.get(src))
    writeEvents(src, "b1.json", Seq(
      line("2024-01-01T00:00:00", 1, "a", 1.0),
      line("2024-01-01T00:00:30", 1, "a", 1.0),   // replay of (user 1, type a)
      line("2024-01-01T00:01:00", 2, "a", 2.0),
      line("2024-01-01T00:02:00", 1, "b", 3.0)))

    val stream = spark.readStream
      .schema("ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .json(src)
    val q = SessionWindows.dedupWithinWatermark(stream, "10 minutes",
        Seq("user_id", "event_type"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dd_out")
      .option("checkpointLocation", s"$dir/chk")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val out = spark.table("dd_out").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    assert(out.length == 3)
    assert(out.toSet == Set((1L, "a"), (2L, "a"), (1L, "b")))
  }

  test("stream-stream interval join matches clicks within the horizon only") {
    val dir = Files.createTempDirectory("ssj").toString
    val clicks = s"$dir/clicks"; Files.createDirectories(Paths.get(clicks))
    val buys = s"$dir/buys"; Files.createDirectories(Paths.get(buys))
    writeEvents(clicks, "b1.json", Seq(
      line("2024-01-01T00:00:00", 1, "click", 1.0),   // within 10m of the buy
      line("2024-01-01T00:08:00", 1, "click", 2.0),   // within
      line("2023-12-31T23:40:00", 1, "click", 3.0),   // too old
      line("2024-01-01T00:05:00", 2, "click", 4.0)))  // other user
    writeEvents(buys, "b1.json", Seq(
      line("2024-01-01T00:09:00", 1, "buy", 50.0)))

    def stream(path: String) = spark.readStream
      .schema("ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .json(path)
    val q = StreamJoins.intervalJoin(stream(clicks), stream(buys),
        "10 minutes", "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .option("checkpointLocation", s"$dir/chk")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val out = spark.table("ssj_out").collect()
      .map(r => (r.getAs[Long]("l_user"), r.getAs[Double]("l_value")))
    assert(out.toSet == Set((1L, 1.0), (1L, 2.0)))
  }
}

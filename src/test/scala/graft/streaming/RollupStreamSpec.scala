package graft.streaming

import graft.SparkSpec
import graft.operators.IncrementalAgg
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The streamed rollup must equal the direct aggregate over everything that
  * has arrived, across microbatch boundaries and replays. */
class RollupStreamSpec extends SparkSpec {

  private val schemaDdl = "user_id BIGINT, event_type STRING, value DOUBLE"

  private def line(user: Long, tpe: String, v: Double) =
    s"""{"user_id":$user,"event_type":"$tpe","value":$v}"""

  private def runOnce(src: String, state: String, chk: String): Unit = {
    val q = RollupStream.start(spark, src, state, chk, schemaDdl,
      keys = Seq("event_type"), valueCol = "value")
    q.awaitTermination()
  }

  test("rollup across batches equals the direct aggregate; replay is idempotent") {
    val dir = Files.createTempDirectory("rollup").toString
    val src = s"$dir/src"; Files.createDirectories(Paths.get(src))

    Files.writeString(Paths.get(src, "b1.json"), Seq(
      line(1, "click", 2.0), line(2, "click", 3.0), line(1, "view", 7.0)
    ).mkString("\n"))
    runOnce(src, s"$dir/state", s"$dir/chk")

    Files.writeString(Paths.get(src, "b2.json"), Seq(
      line(3, "click", 5.0), line(1, "buy", 11.0)
    ).mkString("\n"))
    runOnce(src, s"$dir/state", s"$dir/chk")

    import spark.implicits._
    val all = Seq((1L, "click", 2.0), (2L, "click", 3.0), (1L, "view", 7.0),
      (3L, "click", 5.0), (1L, "buy", 11.0))
      .toDF("user_id", "event_type", "value")
    val want = IncrementalAgg.finish(
      IncrementalAgg.partial(all, Seq("event_type"), "value"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq

    def state = RollupStream.read(spark, s"$dir/state",
      IncrementalAgg.partial(all.limit(0), Seq("event_type"), "value"))
    assert(state.orderBy("event_type").collect().map(_.toSeq).toSeq == want)

    // replay recovery: wipe the checkpoint so both batches re-run — the
    // versioned snapshot makes the refold land on identical state
    val chk2 = s"$dir/chk2"
    runOnce(src, s"$dir/state", chk2)
    assert(state.orderBy("event_type").collect().map(_.toSeq).toSeq == want)
  }
}

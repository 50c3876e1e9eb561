package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AuditLogSpec extends SparkSpec {
  import spark.implicits._

  private val now = Timestamp.valueOf("2024-06-01 00:00:00")
  private def day(d: String) = Timestamp.valueOf(s"$d 00:00:00")

  private def log = Seq(
    ("r1", day("2024-05-31"), 200, "recent-ok"),
    ("r2", day("2024-05-20"), 200, "old-ok"),       // >7d success -> truncate
    ("r3", day("2024-05-20"), 500, "old-fail"),     // <30d failure -> keep
    ("r4", day("2024-04-20"), 500, "older-fail"),   // >30d -> truncate
    ("r5", day("2024-01-01"), 200, "ancient"))      // >90d -> delete
    .map { case (id, ts, st, b) =>
      (id, ts, st, b, Map("host" -> "x", "whdb-secret" -> "s"), "/v1/x", "POST")
    }
    .toDF("request_id", "inserted_at", "response_status", "body", "headers", "path", "method")

  test("retention truncates bodies by success/failure age and deletes at 90d") {
    val kept = AuditLog.applyRetention(log, now)
      .select("request_id", "body").as[(String, Option[String])]
      .collect().toMap
    assert(kept.keySet == Set("r1", "r2", "r3", "r4"))
    assert(kept("r1").contains("recent-ok"))
    assert(kept("r2").isEmpty)
    assert(kept("r3").contains("old-fail"))
    assert(kept("r4").isEmpty)
  }

  test("replay re-emits ordered requests with transport headers stripped") {
    val replayed = AuditLog.replay(log,
      col("inserted_at") >= day("2024-05-01"))
    val rows = replayed.collect()
    assert(rows.map(_.getAs[String]("body")).toSet ==
      Set("recent-ok", "old-ok", "old-fail"))
    val headers = rows.head.getAs[Map[String, String]]("headers")
    assert(!headers.contains("host"))
    assert(headers.contains("whdb-secret"))
    assert(replayed.columns.contains(graft.operators.Projection.IngestSeqCol))
  }

  test("replay windows are bounded: ≤4h per call, ≤7d of history") {
    val ok = AuditLog.replayWindow(log,
      Timestamp.valueOf("2024-05-31 00:00:00"),
      Timestamp.valueOf("2024-05-31 04:00:00"), now)
    assert(ok.collect().map(_.getAs[String]("body")).toSet == Set("recent-ok"))
    intercept[IllegalArgumentException] { // > 4h interval
      AuditLog.replayWindow(log,
        Timestamp.valueOf("2024-05-31 00:00:00"),
        Timestamp.valueOf("2024-05-31 04:00:01"), now)
    }
    intercept[IllegalArgumentException] { // reaches past 7d of history
      AuditLog.replayWindow(log,
        Timestamp.valueOf("2024-05-20 00:00:00"),
        Timestamp.valueOf("2024-05-20 01:00:00"), now)
    }
    intercept[IllegalArgumentException] { // empty window
      AuditLog.replayWindow(log,
        Timestamp.valueOf("2024-05-31 02:00:00"),
        Timestamp.valueOf("2024-05-31 02:00:00"), now)
    }
  }
}

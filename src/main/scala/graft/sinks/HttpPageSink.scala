package graft.sinks

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** K3 — the HTTP sync target transport (`sync_target.rb:483-598`): each page
  * POSTs the reference envelope
  * `{rows, integration_id, integration_service, table, sync_timestamp}`
  * as JSON with optional basic auth; any non-2xx is a delivery failure
  * (surfaced through SyncResult.failure / the watermark stops advancing).
  *
  * Also the K4 per-row webhook transport ([[HttpPageSink.WebhookTransport]]):
  * one JSON POST per delivery with the secret header
  * (`webhook_subscription.rb:74-110`).
  */
object HttpPageSink {

  private[sinks] def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => jsonString(s)
    case t: java.sql.Timestamp => jsonString(t.toInstant.toString)
    case d: java.sql.Date => jsonString(d.toString)
    case b: Boolean => b.toString
    case n: java.math.BigDecimal => n.toPlainString
    // JSON has no NaN/Infinity tokens; emitting them would make the whole
    // page body unparseable and wedge the sync watermark on one bad row
    case d: java.lang.Double if d.isNaN || d.isInfinite => "null"
    case f: java.lang.Float if f.isNaN || f.isInfinite => "null"
    case n: Number => n.toString
    case seq: scala.collection.Seq[_] => seq.map(jsonValue).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"${jsonString(k.toString)}:${jsonValue(x)}" }
        .mkString("{", ",", "}")
    case r: Row => rowJson(r)
    case other => jsonString(other.toString)
  }

  private def jsonString(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def rowJson(row: Row): String =
    row.schema.fieldNames.zipWithIndex.map { case (n, i) =>
      s"${jsonString(n)}:${jsonValue(row.get(i))}"
    }.mkString("{", ",", "}")

  private def basicAuthHeader(user: String, pass: String): String =
    "Basic " + java.util.Base64.getEncoder.encodeToString(
      s"$user:$pass".getBytes(StandardCharsets.UTF_8))

  private lazy val client: HttpClient =
    HttpClient.newBuilder().followRedirects(HttpClient.Redirect.NORMAL).build()

  private[sinks] def post(url: String, body: String,
                          headers: Seq[(String, String)],
                          timeout: Duration): Int = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.discarding()).statusCode()
  }

  /** The page sink. `schema` orders/names the row fields in the envelope;
    * `syncTimestamp` is the run's `now` (`sync_target.rb:563-569`). */
  final class Sink(url: String, integrationId: String,
                   integrationService: String, table: String,
                   st: StructType, syncTimestamp: java.sql.Timestamp,
                   basicAuth: Option[(String, String)] = None,
                   timeout: Duration = Duration.ofSeconds(10))
      extends SyncTarget.PageSink {
    def writePage(page: Seq[Row], pageIdx: Long): Unit = {
      val rows = page.map { r =>
        st.fieldNames.zipWithIndex.map { case (n, i) =>
          s"${jsonValue(n)}:${jsonValue(r.get(i))}"
        }.mkString("{", ",", "}")
      }.mkString("[", ",", "]")
      val body =
        s"""{"rows":$rows,"integration_id":${jsonValue(integrationId)},""" +
          s""""integration_service":${jsonValue(integrationService)},""" +
          s""""table":${jsonValue(table)},""" +
          s""""sync_timestamp":${jsonValue(syncTimestamp)}}"""
      val auth = basicAuth.map { case (u, p) =>
        "Authorization" -> basicAuthHeader(u, p) }.toSeq
      val status = post(url, body, auth, timeout)
      if (status < 200 || status >= 300)
        throw new RuntimeException(s"http sync POST $url returned $status")
    }
  }

  /** K4 — per-row webhook delivery transport: JSON POST with the secret
    * header; 2xx = delivered (`webhook_subscription.rb:74-110`). */
  final class WebhookTransport(secret: String,
                               timeout: Duration = Duration.ofSeconds(10))
      extends Notify.Transport {
    def post(url: String, payload: String): Boolean = {
      val status = HttpPageSink.post(url, payload,
        Seq("Whdb-Webhook-Secret" -> secret), timeout)
      status >= 200 && status < 300
    }
  }
}

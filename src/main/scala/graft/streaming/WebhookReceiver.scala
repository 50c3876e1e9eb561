package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.sources.WebhookAuth
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardOpenOption}
import java.util.concurrent.atomic.AtomicLong

/** S1's front door executed for real: an in-process HTTP endpoint that
  * receives webhook POSTs, verifies them per-integration, audit-logs every
  * request, and lands accepted ones in the JSONL request log that
  * [[WebhookStream.start]] ingests — the engine-side re-expression of
  * `api/helpers.rb:167-255` (`handle_webhook_request`):
  *
  *  - route = `/v1/service_integrations/<opaque_id>`, like the reference's
  *    webhook routes; unknown opaque id is 404;
  *  - the integration's auth family ([[WebhookAuth]]) decides; a reject is
  *    answered 401 with the `Whdb-Rejected-Reason` header
  *    (`api/helpers.rb:210-213`) and is NOT landed;
  *  - every request (accepted or not) is appended to the logged-webhooks
  *    audit file synchronously, as the reference audit-logs in-request
  *    ("It should be fast enough", `api/helpers.rb:228-231`);
  *  - accepted requests land in [[WebhookStream.requestSchema]] form with a
  *    receiver-assigned monotone `__ingest_seq` — arrival order is the
  *    last-wins tiebreak the merge relies on;
  *  - the response body is the replicator's synchronous webhook response
  *    (`webhook_response`), 202 by default.
  *
  * Each accepted request lands as its own immutable file: the streaming file
  * source tails the directory by discovering new files, so append-in-place
  * is not an option. At production rates a fronting collector would batch
  * many requests per file; one-per-request keeps the landing atomic here.
  */
object WebhookReceiver {

  /** One mounted integration: how to verify, and what to answer. */
  final case class Route(
      verify: (Map[String, String], String) => WebhookAuth.Verdict,
      responseStatus: Int = 202,
      responseBody: String = """{"o":"k"}""")

  final case class Started(server: HttpServer, port: Int) extends AutoCloseable {
    def url(opaqueId: String): String =
      s"http://127.0.0.1:$port/v1/service_integrations/$opaqueId"
    def close(): Unit = server.stop(0)
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jsonObj(m: Iterable[(String, String)]): String =
    m.map { case (k, v) => s"${jsonStr(k)}:${jsonStr(v)}" }.mkString("{", ",", "}")

  /** Start the receiver on `port` (0 = ephemeral). `landingDir` receives one
    * JSONL file per accepted request; `auditFile` gets one line per request
    * (the logged-webhooks table, `logged_webhook.rb`). */
  def start(routes: Map[String, Route], landingDir: Path, auditFile: Path,
            port: Int = 0): Started = {
    Files.createDirectories(landingDir)
    if (auditFile.getParent != null) Files.createDirectories(auditFile.getParent)
    // Resume the sequence from a dedicated high-water-mark sidecar, not
    // (only) from surviving landing files: the landing dir grows one file
    // per request forever, so a retention/archival job WILL eventually
    // delete old req-N.json files — and a restart that derived its seq from
    // the survivors would then re-issue names the streaming checkpoint has
    // already recorded as processed (silent data loss). The sidecar is
    // written atomically on every accept; the scan-forward over surviving
    // files covers the crash window between landing req-N and persisting N.
    val hwmFile = landingDir.resolve("_seq_hwm")
    val sidecarHwm =
      if (Files.exists(hwmFile)) Files.readString(hwmFile).trim.toLong else 0L
    val scannedHwm = {
      val s = Files.list(landingDir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .map(_.getFileName.toString)
          .collect { case n if n.matches("req-\\d+\\.json") =>
            n.stripPrefix("req-").stripSuffix(".json").toLong }
          .foldLeft(0L)(math.max)
      } finally s.close()
    }
    val seq = new AtomicLong(math.max(sidecarHwm, scannedHwm))
    // Serialized + monotone: concurrent accepts must not let a lower seq
    // overwrite a higher persisted mark. (Both sidecar names start with
    // '_'/'.' so Spark's file source ignores them.)
    val hwmLock = new Object
    var persistedHwm = math.max(sidecarHwm, scannedHwm)
    def persistHwm(n: Long): Unit = hwmLock.synchronized {
      if (n > persistedHwm) {
        val tmp = landingDir.resolve("._seq_hwm.tmp")
        Files.writeString(tmp, n.toString)
        Files.move(tmp, hwmFile,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        persistedHwm = n
      }
    }
    val auditLock = new Object
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

    def respond(ex: HttpExchange, status: Int, body: String,
                extraHeaders: Seq[(String, String)] = Nil): Unit = {
      val bytes = body.getBytes(UTF_8)
      extraHeaders.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }

    def audit(opaqueId: String, status: Int, headers: Map[String, String],
              body: String): Unit = auditLock.synchronized {
      // rejected/unknown bodies are truncated for the log table (the
      // reference's retention truncation); accepted bodies are already
      // landed in full, so the audit line may keep them whole for replay
      val kept = if (status >= 400) body.take(4096) else body
      val line = "{" +
        s""""opaque_id":${jsonStr(opaqueId)},"status":$status,""" +
        s""""headers":${jsonObj(headers)},"body":${jsonStr(kept)}}""" + "\n"
      Files.writeString(auditFile, line,
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      ()
    }

    server.createContext("/v1/service_integrations/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = try {
        val path = ex.getRequestURI.getPath
        val opaqueId = path.stripPrefix("/v1/service_integrations/")
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        import scala.jdk.CollectionConverters._
        // first value per header, lower-cased keys: the form WebhookAuth
        // takes. Locale.ROOT: a Turkish-locale JVM's default toLowerCase
        // turns 'I' into a dotless i, so 'X-Signature' would never match
        // 'x-signature' and every signed webhook would be rejected.
        val headers = ex.getRequestHeaders.asScala.map { case (k, vs) =>
          k.toLowerCase(java.util.Locale.ROOT) -> vs.asScala.headOption.getOrElse("")
        }.toMap
        routes.get(opaqueId) match {
          case None =>
            audit(opaqueId, 404, headers, body)
            respond(ex, 404, """{"error":"no service integration"}""")
          case Some(route) =>
            route.verify(headers, body) match {
              case WebhookAuth.Rejected(reason) =>
                audit(opaqueId, 401, headers, body)
                respond(ex, 401, """{"error":"unauthorized"}""",
                  Seq("Whdb-Rejected-Reason" -> reason))
              case WebhookAuth.Accepted =>
                val n = seq.incrementAndGet()
                val line = "{" +
                  s""""body":${jsonStr(body)},"headers":${jsonObj(headers)},""" +
                  s""""path":${jsonStr(path)},"method":${jsonStr(ex.getRequestMethod)},""" +
                  s""""__ingest_seq":$n}""" + "\n"
                // write-then-rename so the streaming source never reads a
                // partially-written landing file
                val tmp = landingDir.resolve(s".req-$n.json.tmp")
                Files.writeString(tmp, line)
                Files.move(tmp, landingDir.resolve(s"req-$n.json"),
                  java.nio.file.StandardCopyOption.ATOMIC_MOVE)
                persistHwm(n)
                audit(opaqueId, route.responseStatus, headers, body)
                respond(ex, route.responseStatus, route.responseBody)
            }
        }
      } catch {
        case e: Exception => respond(ex, 500, s"""{"error":${jsonStr(e.toString)}}""")
      }
    })
    server.start()
    Started(server, server.getAddress.getPort)
  }
}

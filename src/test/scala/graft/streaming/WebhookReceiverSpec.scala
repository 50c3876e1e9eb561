package graft.streaming

import graft.SparkSpec
import graft.replicators.Replicators
import graft.sources.WebhookAuth
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

/** S1 end-to-end over REAL HTTP, matching `api/helpers.rb:167-255` +
  * `jobs/process_webhook.rb:32-45`: in-process HTTP server -> per-service
  * verification -> audit insert -> landing log -> WebhookStream -> merged
  * snapshot. The only fake is the network distance. */
class WebhookReceiverSpec extends SparkSpec {

  private val secret = "whsec_test_1234"

  private def signed(body: String, atEpoch: Long): String =
    s"t=$atEpoch,v1=${WebhookAuth.hmacSha256Hex(secret, s"$atEpoch.$body")}"

  private def charge(id: String, amount: Int, created: Long) =
    s"""{"id":"$id","object":"charge","amount":$amount,"created":$created,"status":"ok"}"""
  private def event(resource: String, created: Long) =
    s"""{"object":"event","created":$created,"data":{"object":$resource}}"""

  /** Landed request files only — the landing dir also holds the `_seq_hwm`
    * sidecar (which Spark's file source ignores, names starting with '_'). */
  private def landed(dir: java.nio.file.Path): Long = {
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.count(_.getFileName.toString.matches("req-\\d+\\.json")).toLong
    } finally s.close()
  }

  private def post(client: HttpClient, url: String, body: String,
                   headers: (String, String)*): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  test("HTTP receive -> verify -> audit -> land -> stream -> merged table") {
    val dir = Files.createTempDirectory("whhttp")
    val landing = dir.resolve("landing")
    val audit = dir.resolve("audit/logged_webhooks.jsonl")
    val now = 1700000000L
    val routes = Map("svi_stripe_x" -> WebhookReceiver.Route(
      verify = (headers, body) => WebhookAuth.verifySignedHeader(
        headers.get("stripe-signature"), body, secret, nowEpoch = now)))
    val started = WebhookReceiver.start(routes, landing, audit)
    try {
      val client = HttpClient.newHttpClient()
      val url = started.url("svi_stripe_x")

      // two valid webhooks, arrival order sets the merge tiebreak
      val b1 = event(charge("ch_1", 100, 1000), 1000)
      assert(post(client, url, b1, "Stripe-Signature" -> signed(b1, now)).statusCode() == 202)
      val b2 = event(charge("ch_1", 111, 3000), 3000)
      val r2 = post(client, url, b2, "Stripe-Signature" -> signed(b2, now))
      assert(r2.statusCode() == 202 && r2.body() == """{"o":"k"}""")

      // bad signature: 401 + reason header, NOT landed
      val bad = post(client, url, b1, "Stripe-Signature" -> s"t=$now,v1=deadbeef")
      assert(bad.statusCode() == 401)
      assert(bad.headers().firstValue("Whdb-Rejected-Reason").get == "signature mismatch")
      // stale timestamp: its own reason (replay protection)
      val stale = post(client, url, b1, "Stripe-Signature" -> signed(b1, now - 9999))
      assert(stale.headers().firstValue("Whdb-Rejected-Reason").get == "timestamp out of tolerance")
      // unknown integration: 404
      assert(post(client, started.url("svi_nope"), b1).statusCode() == 404)

      // only the two accepted requests landed
      assert(landed(landing) == 2)

      // the landed log streams into the merged snapshot (process_webhook.rb)
      val q = WebhookStream.start(spark, Replicators.stripeChargeV1,
        landing.toString, s"$dir/snap", s"$dir/chk")
      q.awaitTermination()
      val out = new SnapshotStore(s"$dir/snap")
        .readOr(graft.operators.Pipeline.emptyTarget(Replicators.stripeChargeV1, spark))
        .collect()
      assert(out.length == 1)
      assert(out(0).getAs[String]("stripe_id") == "ch_1")
      assert(out(0).getAs[Long]("amount") == 111L) // newer update won

      // the audit log captured EVERY request with its status
      val lines = Files.readAllLines(audit)
      assert(lines.size == 5)
      val statuses = spark.read.json(audit.toString)
        .groupBy("status").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(statuses == Map(202L -> 2L, 401L -> 2L, 404L -> 1L))
    } finally started.close()
  }

  test("audit keeps accepted bodies whole and truncates rejected ones") {
    val dir = Files.createTempDirectory("whhttp3")
    val audit = dir.resolve("audit.jsonl")
    val routes = Map("svi_sec" -> WebhookReceiver.Route(
      verify = (headers, _) => WebhookAuth.verifySecretHeader(
        headers.get("x-secret"), "s3cr3t")))
    val started = WebhookReceiver.start(routes, dir.resolve("landing"), audit)
    try {
      val client = HttpClient.newHttpClient()
      val url = started.url("svi_sec")
      val big = "x" * 10000
      assert(post(client, url, big, "X-Secret" -> "s3cr3t").statusCode() == 202)
      assert(post(client, url, big, "X-Secret" -> "wrong").statusCode() == 401)
      val rows = spark.read.json(audit.toString)
        .select("status", "body").collect()
        .map(r => r.getLong(0) -> r.getString(1).length).toMap
      assert(rows(202L) == 10000) // accepted: whole, replayable
      assert(rows(401L) == 4096)  // rejected: truncated for the log
    } finally started.close()
  }

  test("a restarted receiver resumes the ingest seq instead of overwriting") {
    val dir = Files.createTempDirectory("whhttp4")
    val landing = dir.resolve("landing")
    val routes = Map("svi_open" -> WebhookReceiver.Route(
      verify = (_, _) => WebhookAuth.Accepted))
    val client = HttpClient.newHttpClient()
    val s1 = WebhookReceiver.start(routes, landing, dir.resolve("a1.jsonl"))
    try (1 to 3).foreach(i => post(client, s1.url("svi_open"), s"""{"i":$i}"""))
    finally s1.close()
    // restart on the SAME durable landing dir: seq must continue at 4, not
    // reset to 1 and silently replace req-1.json (already recorded as
    // processed by the streaming source)
    val s2 = WebhookReceiver.start(routes, landing, dir.resolve("a2.jsonl"))
    try post(client, s2.url("svi_open"), """{"i":4}""")
    finally s2.close()
    assert(landed(landing) == 4)
    val seqs = spark.read.schema(WebhookStream.requestSchema)
      .json(landing.toString)
      .select("__ingest_seq").collect().map(_.getLong(0)).sorted
    assert(seqs.toSeq == (1L to 4L))

    // retention deletes every landed file; the sidecar high-water mark must
    // still carry the seq forward — a scan-only restart would reset to 1
    // and re-issue names the streaming checkpoint already processed
    import scala.jdk.CollectionConverters._
    val s = Files.list(landing)
    try s.iterator().asScala
      .filter(_.getFileName.toString.matches("req-\\d+\\.json"))
      .toList.foreach(f => Files.delete(f))
    finally s.close()
    val s3 = WebhookReceiver.start(routes, landing, dir.resolve("a3.jsonl"))
    try post(client, s3.url("svi_open"), """{"i":5}""")
    finally s3.close()
    val after = spark.read.schema(WebhookStream.requestSchema)
      .json(landing.toString)
      .select("__ingest_seq").collect().map(_.getLong(0))
    assert(after.toSeq == Seq(5L))
  }

  test("concurrent senders land with unique monotone ingest seqs") {
    val dir = Files.createTempDirectory("whhttp2")
    val landing = dir.resolve("landing")
    val audit = dir.resolve("audit.jsonl")
    val routes = Map("svi_open" -> WebhookReceiver.Route(
      verify = (_, _) => WebhookAuth.Accepted))
    val started = WebhookReceiver.start(routes, landing, audit)
    try {
      val client = HttpClient.newHttpClient()
      val url = started.url("svi_open")
      val threads = (1 to 4).map { t =>
        new Thread(() => (1 to 25).foreach { i =>
          post(client, url, s"""{"t":$t,"i":$i}""")
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(landed(landing) == 100)
      val seqs = spark.read.schema(WebhookStream.requestSchema)
        .json(landing.toString)
        .select("__ingest_seq").collect().map(_.getLong(0)).sorted
      assert(seqs.toSeq == (1L to 100L)) // unique, gapless, monotone
    } finally started.close()
  }
}

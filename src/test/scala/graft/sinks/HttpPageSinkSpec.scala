package graft.sinks

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.SparkSpec
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

/** K3/K4 over a REAL http round trip (in-process JDK server): envelope
  * shape, basic auth, failure surfacing, webhook retry delivery. */
class HttpPageSinkSpec extends SparkSpec {
  import spark.implicits._

  private def withServer[T](handler: (String, HttpExchange) => Int)(f: String => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val status = handler(body, ex)
        ex.sendResponseHeaders(status, -1)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def table = Seq(
    (1L, "a", Timestamp.valueOf("2024-01-01 00:00:00")),
    (2L, "b", Timestamp.valueOf("2024-01-02 00:00:00")),
    (3L, "c", Timestamp.valueOf("2024-01-03 00:00:00")))
    .toDF("id", "name", "updated")

  test("pages POST the reference envelope with basic auth (K3)") {
    val bodies = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val auths = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    withServer { (body, ex) =>
      bodies.add(body)
      auths.add(Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""))
      200
    } { url =>
      val sink = new HttpPageSink.Sink(url, "svi_x", "stripe_charge_v1",
        "charges", table.schema, Timestamp.valueOf("2024-02-01 00:00:00"),
        basicAuth = Some(("u", "p")))
      val r = SyncTarget.sync(table, "updated",
        Timestamp.valueOf("2024-01-01 00:00:00"),
        Timestamp.valueOf("2024-01-03 00:00:00"), pageSize = 2, sink)
      assert(r.pagesDelivered == 2 && r.rowsDelivered == 3)
    }
    assert(bodies.size == 2)
    val first = bodies.asScala.head
    assert(first.contains(""""integration_id":"svi_x""""))
    assert(first.contains(""""integration_service":"stripe_charge_v1""""))
    assert(first.contains(""""table":"charges""""))
    assert(first.contains(""""sync_timestamp":"2024-02-01T00:00:00Z""""))
    assert(first.contains(""""rows":[{"id":1,"name":"a","updated":"2024-01-01T00:00:00Z"}"""))
    assert(auths.asScala.forall(_ == "Basic " +
      java.util.Base64.getEncoder.encodeToString("u:p".getBytes)))
  }

  test("non-2xx aborts the run; committed watermark stops at delivered pages") {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer { (_, _) => if (n.incrementAndGet() == 1) 200 else 500 } { url =>
      val sink = new HttpPageSink.Sink(url, "svi_x", "s", "t",
        table.schema, Timestamp.valueOf("2024-02-01 00:00:00"))
      val ex = intercept[RuntimeException] {
        SyncTarget.sync(table, "updated",
          Timestamp.valueOf("2024-01-01 00:00:00"),
          Timestamp.valueOf("2024-01-03 00:00:00"), pageSize = 2, sink)
      }
      assert(ex.getMessage.contains("returned 500"))
    }
  }

  test("webhook transport delivers with the secret header and retries (K4)") {
    val flaky = new java.util.concurrent.atomic.AtomicInteger(0)
    val secrets = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    withServer { (_, ex) =>
      secrets.add(ex.getRequestHeaders.getFirst("Whdb-Webhook-Secret"))
      if (ex.getRequestURI.getPath == "/flaky" && flaky.incrementAndGet() <= 2) 503
      else 200
    } { url =>
      val changed = Seq(("r1", 10)).toDF("id", "v")
      val subs = Seq(
        ("s1", s"$url/ok", true),
        ("s2", s"$url/flaky", true)).toDF("subscription_id", "url", "active")
      val q = Notify.enqueueDeliveries(changed, subs, "fake_v1")
      val ledger = Notify.deliverAll(q,
        new HttpPageSink.WebhookTransport("whsec_1"), maxWaves = 5)
      assert(Notify.pendingDeliveries(ledger).isEmpty)
      val attempts = ledger.select("url", "attempts").as[(String, Int)].collect().toMap
      assert(attempts(s"$url/ok") == 1)
      assert(attempts(s"$url/flaky") == 3)
    }
    assert(secrets.asScala.toSet == Set("whsec_1"))
  }
}

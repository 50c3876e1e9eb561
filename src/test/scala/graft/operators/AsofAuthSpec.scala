package graft.operators

import graft.SparkSpec
import graft.sources.WebhookAuth
import graft.sources.WebhookAuth.{Accepted, Rejected}

class AsofAuthSpec extends SparkSpec {
  import spark.implicits._

  test("asof join attaches latest strictly-earlier right row per key") {
    val left = Seq((1L, "u1", 100L), (2L, "u1", 200L), (3L, "u2", 50L))
      .toDF("id", "k", "ts")
    val right = Seq(("u1", 90L, "a"), ("u1", 150L, "b"), ("u1", 200L, "same-ts"),
      ("u2", 60L, "later"))
      .toDF("k", "ts", "v")
    val got = AsofJoin.asof(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .orderBy("id").select("id", "asof_v").as[(Long, Option[String])].collect()
    assert(got(0) == ((1L, Some("a"))))  // 90 < 100
    assert(got(1) == ((2L, Some("b"))))  // 150 < 200; same-ts row excluded (strict <)
    assert(got(2) == ((3L, None)))       // no earlier right row
  }

  test("asof join carries multiple payload columns consistently") {
    val left = Seq((1L, "u1", 100L)).toDF("id", "k", "ts")
    val right = Seq(("u1", 50L, "v1", 10L), ("u1", 90L, "v2", 20L))
      .toDF("k", "ts", "name", "amount")
    val got = AsofJoin.asof(left, right, Seq("k"), "ts", "ts", Seq("name", "amount"))
      .select("asof_name", "asof_amount").collect()(0)
    // both payload columns must come from the SAME (latest) right row
    assert(got.getString(0) == "v2" && got.getLong(1) == 20L)
  }

  test("null payload fields of the latest right row stay null") {
    val left = Seq((1L, "u1", 100L)).toDF("id", "k", "ts")
    val right = Seq(("u1", 50L, Some("old"), Some(10L)),
      ("u1", 90L, None, Some(20L))) // latest row: name IS NULL
      .toDF("k", "ts", "name", "amount")
    val got = AsofJoin.asof(left, right, Seq("k"), "ts", "ts", Seq("name", "amount"))
      .select("asof_name", "asof_amount").collect()(0)
    // the latest row is adopted wholesale: its null name must NOT be
    // backfilled from the older row
    assert(got.isNullAt(0) && got.getLong(1) == 20L)
  }

  test("signed-header verification: accept, tamper, stale, malformed") {
    val body = """{"id":"ch_1"}"""
    val secret = "whsec_test"
    val t = 1700000000L
    val sig = WebhookAuth.hmacSha256Hex(secret, s"$t.$body")
    val good = Some(s"t=$t,v1=$sig")
    assert(WebhookAuth.verifySignedHeader(good, body, secret, t + 10) == Accepted)
    assert(WebhookAuth.verifySignedHeader(good, body + " ", secret, t + 10)
      .isInstanceOf[Rejected]) // tampered body
    assert(WebhookAuth.verifySignedHeader(good, body, secret, t + 9999) ==
      Rejected("timestamp out of tolerance"))
    assert(WebhookAuth.verifySignedHeader(Some("v1=zzz"), body, secret, t) ==
      Rejected("malformed signature header"))
    assert(WebhookAuth.verifySignedHeader(None, body, secret, t) ==
      Rejected("missing signature header"))
  }

  test("static secret header verification") {
    assert(WebhookAuth.verifySecretHeader(Some("s3cr3t"), "s3cr3t") == Accepted)
    assert(WebhookAuth.verifySecretHeader(Some("nope"), "s3cr3t") ==
      Rejected("secret mismatch"))
    assert(WebhookAuth.verifySecretHeader(None, "s3cr3t") ==
      Rejected("missing secret header"))
  }
}

package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.WebhookAuth._

/** Contract tests for the per-service webhook verification families,
  * mirroring the reference's reject reasons (`github_repo_v1_mixin.rb:59-68`,
  * `intercom.rb:15-24`, `shopify.rb:31-34`, `plivo.rb:27-51`,
  * `twilio_sms_v1.rb`). */
class WebhookAuthSpec extends AnyFunSuite {

  test("github sha256: accept golden vector, reject missing/unset/invalid") {
    // Golden vector from GitHub's public webhook-validation docs.
    val secret = "It's a Secret to Everybody"
    val body = "Hello, World!"
    val header = "sha256=757107ea0eb2509fc211221cce984b8a37570b6d7586c22c46f4379c8b043e17"
    assert(verifyGithubSha256(Some(header), body, Some(secret)) == Accepted)
    assert(verifyGithubSha256(None, body, Some(secret)) == Rejected("missing sha256"))
    assert(verifyGithubSha256(Some(header), body, None) == Rejected("no secret set"))
    assert(verifyGithubSha256(Some(header), body + "!", Some(secret)) ==
      Rejected("invalid sha256"))
    assert(verifyGithubSha256(Some("sha256=deadbeef"), body, Some(secret)) ==
      Rejected("invalid sha256"))
  }

  test("intercom sha1=<hex> prefixed hmac") {
    val secret = "app_secret"
    val body = """{"type":"notification_event"}"""
    val good = "sha1=" + hmacSha1Hex(secret, body)
    assert(verifyPrefixedSha1(Some(good), body, secret) == Accepted)
    assert(verifyPrefixedSha1(None, body, secret) == Rejected("missing hmac"))
    assert(verifyPrefixedSha1(Some(good), body + " ", secret) == Rejected("invalid hmac"))
    // a sha256-format header against the sha1 family must not verify
    assert(verifyPrefixedSha1(Some("sha256=" + hmacSha256Hex(secret, body)), body, secret) ==
      Rejected("invalid hmac"))
  }

  test("shopify base64 body hmac") {
    val secret = "shpss_secret"
    val body = """{"id":123,"title":"T"}"""
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(secret.getBytes("UTF-8"), "HmacSHA256"))
    val good = java.util.Base64.getEncoder.encodeToString(mac.doFinal(body.getBytes("UTF-8")))
    assert(verifyBase64BodyHmac(Some(good), body, secret) == Accepted)
    assert(verifyBase64BodyHmac(None, body, secret) == Rejected("missing hmac"))
    assert(verifyBase64BodyHmac(Some(good), body + "x", secret) == Rejected("invalid hmac"))
    // hex encoding of the same mac must not pass the base64 family
    val hex = hmacSha256Hex(secret, body)
    assert(verifyBase64BodyHmac(Some(hex), body, secret) == Rejected("invalid hmac"))
  }

  test("plivo url+nonce signature strips the query string before signing") {
    val token = "auth_token_1"
    val nonce = "31627358979411"
    val canonical = "https://example.com/v1/sms"
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(token.getBytes("UTF-8"), "HmacSHA256"))
    val sig = java.util.Base64.getEncoder.encodeToString(
      mac.doFinal((canonical + nonce).getBytes("UTF-8")))
    // signature computed over the query-stripped URL verifies even when the
    // inbound request URL carries a query string (plivo.rb:35-36)
    assert(verifyUrlNonceSignature(Some(sig), Some(nonce),
      "https://example.com/v1/sms?From=15551234&Text=hi", token) == Accepted)
    assert(verifyUrlNonceSignature(Some(sig), Some(nonce), canonical, token) == Accepted)
    assert(verifyUrlNonceSignature(None, Some(nonce), canonical, token) ==
      Rejected("missing signature"))
    assert(verifyUrlNonceSignature(Some(sig), None, canonical, token) ==
      Rejected("missing nonce"))
    assert(verifyUrlNonceSignature(Some(sig), Some(nonce + "1"), canonical, token) ==
      Rejected("invalid signature"))
    assert(verifyUrlNonceSignature(Some(sig), Some(nonce),
      "https://evil.example.net/v1/sms", token) == Rejected("invalid signature"))
  }

  test("basic auth: challenge on missing/non-basic, invalid on wrong creds") {
    val secret = "user:pass"
    val good = "Basic " + java.util.Base64.getEncoder.encodeToString(secret.getBytes("UTF-8"))
    assert(verifyBasicAuth(Some(good), secret) == Accepted)
    assert(verifyBasicAuth(None, secret) == Rejected("challenge"))
    assert(verifyBasicAuth(Some("Bearer tok"), secret) == Rejected("challenge"))
    val bad = "Basic " + java.util.Base64.getEncoder.encodeToString("user:wrong".getBytes("UTF-8"))
    assert(verifyBasicAuth(Some(bad), secret) == Rejected("invalid"))
    assert(verifyBasicAuth(Some("Basic %%%not-base64%%%"), secret) == Rejected("invalid"))
  }

  test("plivo: a malformed request URL is a verdict, not an exception") {
    assert(verifyUrlNonceSignature(Some("sig"), Some("nonce"),
      "http://h ost/path with spaces", "tok") == Rejected("malformed url"))
    assert(verifyUrlNonceSignature(Some("sig"), Some("nonce"),
      "http://host/%zz-bad-escape", "tok") == Rejected("malformed url"))
  }

  test("increase iso signed header: multi-v1, asymmetric cutoffs, exact reasons") {
    val secret = "increase_secret"
    val body = """{"id":"evt_1"}"""
    val now = 1700000000L // 2023-11-14T22:13:20Z
    val tIso = "2023-11-14T22:13:20Z"
    val good = hmacSha256Hex(secret, s"$tIso.$body")
    assert(verifyIsoSignedHeader(Some(s"t=$tIso,v1=$good"), body, secret, now) == Accepted)
    // rotation: any matching v1 accepts
    assert(verifyIsoSignedHeader(Some(s"t=$tIso,v1=deadbeef,v1=$good"), body,
      secret, now) == Accepted)
    assert(verifyIsoSignedHeader(None, body, secret, now) == Rejected("missing header"))
    assert(verifyIsoSignedHeader(Some(s"v1=$good"), body, secret, now) ==
      Rejected("missing timestamp"))
    assert(verifyIsoSignedHeader(Some(s"t=$tIso"), body, secret, now) ==
      Rejected("missing signatures"))
    // 36 days old > 35-day cutoff; 5 days ahead > 4-day cutoff
    assert(verifyIsoSignedHeader(Some(s"t=2023-10-09T22:13:20Z,v1=$good"), body,
      secret, now) == Rejected("too old"))
    assert(verifyIsoSignedHeader(Some(s"t=2023-11-19T22:13:21Z,v1=$good"), body,
      secret, now) == Rejected("too new"))
    assert(verifyIsoSignedHeader(Some(s"t=$tIso,v1=deadbeef"), body, secret, now) ==
      Rejected("invalid signature"))
    // an offset timestamp signs as its UTC instant, as ruby's t.utc.iso8601
    val offIso = "2023-11-14T23:13:20+01:00"
    assert(verifyIsoSignedHeader(Some(s"t=$offIso,v1=$good"), body, secret, now) == Accepted)
  }

  test("front timestamped base64 signature") {
    val secret = "front_app_secret"
    val body = """{"payload":{}}"""
    val ts = "1700000000"
    val good = {
      val m = javax.crypto.Mac.getInstance("HmacSHA256")
      m.init(new javax.crypto.spec.SecretKeySpec(secret.getBytes("UTF-8"), "HmacSHA256"))
      java.util.Base64.getEncoder.encodeToString(m.doFinal(s"$ts:$body".getBytes("UTF-8")))
    }
    assert(verifyTimestampedBase64(Some(good), Some(ts), body, secret) == Accepted)
    assert(verifyTimestampedBase64(None, Some(ts), body, secret) ==
      Rejected("missing signature"))
    assert(verifyTimestampedBase64(Some(good), Some("1700000001"), body, secret) ==
      Rejected("invalid signature")) // timestamp binds the signature
    assert(verifyTimestampedBase64(Some(good), None, body, secret) ==
      Rejected("invalid signature"))
  }

  test("email octopus sha256=<hex> prefixed hmac") {
    val secret = "eo_secret"
    val body = """[{"type":"contact.created"}]"""
    val good = "sha256=" + hmacSha256Hex(secret, body)
    assert(verifyPrefixedSha256(Some(good), body, secret) == Accepted)
    assert(verifyPrefixedSha256(None, body, secret) == Rejected("missing signature"))
    assert(verifyPrefixedSha256(Some(good), body + " ", secret) ==
      Rejected("invalid signature"))
  }

  test("postmark ip allowlist") {
    val ips = WebhookPolicies.PostmarkAllowedIps
    assert(verifyIpAllowlist("3.134.147.250", ips) == Accepted)
    assert(verifyIpAllowlist("8.8.8.8", ips) == Rejected("invalid ip"))
    assert(verifyIpAllowlist("", ips) == Rejected("invalid ip"))
  }

  test("policy dispatch: per-family verdicts through the descriptor mapping") {
    import WebhookPolicies._
    val body = """{"id":"x"}"""
    // stripe family: epoch signed header through the policy surface
    val now = 1700000000L
    val sig = s"t=$now,v1=${hmacSha256Hex("sk", s"$now.$body")}"
    val stripe = policyFor("stripe_charge_v1").get
    assert(stripe.verify(WebhookContext(Map("stripe-signature" -> sig), body,
      nowEpoch = now), Some("sk")) == Accepted)
    assert(stripe.verify(WebhookContext(Map.empty, body, nowEpoch = now),
      None) == Rejected("no secret set"))
    // roots reject data webhooks; unverifiable families accept
    assert(policyFor("front_marketplace_root_v1").get
      .verify(WebhookContext(Map.empty, body, nowEpoch = now), None)
      .isInstanceOf[Rejected])
    assert(policyFor("convertkit_tag_v1").get
      .verify(WebhookContext(Map.empty, body, nowEpoch = now), None) == Accepted)
    // postmark consults the source ip, no secret involved
    assert(policyFor("postmark_inbound_message_v1").get
      .verify(WebhookContext(Map.empty, body, nowEpoch = now, remoteIp = "50.31.156.6"), None) ==
      Accepted)
  }
}

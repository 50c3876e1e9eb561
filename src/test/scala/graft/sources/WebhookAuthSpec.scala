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
}

package graft.sources

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Webhook request verification (S1 dispatch, `base.rb:114-136`): each
  * replicator authenticates inbound requests before they enter the pipeline;
  * rejects are answered 4xx with a rejection-reason header and still
  * audit-logged (`api/helpers.rb:210-213`).
  *
  * Public verification families modeled here:
  *  - HMAC signature with timestamp tolerance (Stripe `t=..,v1=..` style);
  *  - static secret header equality (constant-time);
  *  - prefixed body HMAC, `sha256=<hex>` (GitHub, `github.rb:18-21`,
  *    dispatched from `github_repo_v1_mixin.rb:59-68`) and `sha1=<hex>`
  *    (Intercom, `intercom.rb:15-24`);
  *  - base64 body HMAC (Shopify, `shopify.rb:31-34`);
  *  - URL+nonce HMAC over the query-stripped request URL (Plivo V2,
  *    `plivo.rb:27-51`);
  *  - HTTP Basic credential equality (Twilio, `twilio_sms_v1.rb`).
  */
object WebhookAuth {

  sealed trait Verdict
  case object Accepted extends Verdict
  final case class Rejected(reason: String) extends Verdict

  def hmacSha256Hex(secret: String, payload: String): String = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes("UTF-8"), "HmacSHA256"))
    mac.doFinal(payload.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def constantTimeEquals(a: String, b: String): Boolean =
    java.security.MessageDigest.isEqual(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  /** Stripe-style signature header: `t=<unix>,v1=<hmac(t + "." + body)>`.
    * Rejects missing/garbled headers, stale timestamps (tolerance), and bad
    * signatures — each with its own reason (the Whdb-Rejected-Reason
    * analog). */
  def verifySignedHeader(header: Option[String], body: String, secret: String,
                         nowEpoch: Long, toleranceSec: Long = 300): Verdict =
    header match {
      case None => Rejected("missing signature header")
      case Some(h) =>
        val parts = h.split(",").flatMap { kv =>
          kv.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
        }.toMap
        (parts.get("t").flatMap(_.toLongOption), parts.get("v1")) match {
          case (Some(t), Some(sig)) =>
            if (math.abs(nowEpoch - t) > toleranceSec) Rejected("timestamp out of tolerance")
            else if (constantTimeEquals(hmacSha256Hex(secret, s"$t.$body"), sig)) Accepted
            else Rejected("signature mismatch")
          case _ => Rejected("malformed signature header")
        }
    }

  /** Static secret header (e.g. the reference's fake/webhookdb secret
    * checks). */
  def verifySecretHeader(header: Option[String], secret: String): Verdict =
    header match {
      case Some(h) if constantTimeEquals(h, secret) => Accepted
      case Some(_) => Rejected("secret mismatch")
      case None => Rejected("missing secret header")
    }

  private def hmacRaw(algo: String, secret: String, payload: String): Array[Byte] = {
    val mac = Mac.getInstance(algo)
    mac.init(new SecretKeySpec(secret.getBytes("UTF-8"), algo))
    mac.doFinal(payload.getBytes("UTF-8"))
  }

  def hmacSha1Hex(secret: String, payload: String): String =
    hmacRaw("HmacSHA1", secret, payload).map("%02x".format(_)).mkString

  /** GitHub style (`github.rb:18-21`): `X-Hub-Signature-256` carries
    * `sha256=<hex hmac-sha256(body)>`. Reject reasons mirror
    * `github_repo_v1_mixin.rb:59-68` — "missing sha256" when the header is
    * absent, "no secret set" when the integration has none (the reference
    * answers 409), "invalid sha256" on mismatch. */
  def verifyGithubSha256(header: Option[String], body: String,
                         secret: Option[String]): Verdict =
    header match {
      case None => Rejected("missing sha256")
      case Some(h) =>
        secret match {
          case None => Rejected("no secret set")
          case Some(s) =>
            if (constantTimeEquals("sha256=" + hmacSha256Hex(s, body), h)) Accepted
            else Rejected("invalid sha256")
        }
    }

  /** Intercom style (`intercom.rb:15-24`): `X-Hub-Signature` carries
    * `sha1=<hex hmac-sha1(body)>`. */
  def verifyPrefixedSha1(header: Option[String], body: String, secret: String): Verdict =
    header match {
      case None => Rejected("missing hmac")
      case Some(h) =>
        if (constantTimeEquals("sha1=" + hmacSha1Hex(secret, body), h)) Accepted
        else Rejected("invalid hmac")
    }

  /** Shopify style (`shopify.rb:31-34`): `X-Shopify-Hmac-SHA256` carries the
    * strict-base64 of the raw hmac-sha256(body). */
  def verifyBase64BodyHmac(header: Option[String], body: String, secret: String): Verdict =
    header match {
      case None => Rejected("missing hmac")
      case Some(h) =>
        val calc = java.util.Base64.getEncoder.encodeToString(hmacRaw("HmacSHA256", secret, body))
        if (constantTimeEquals(calc, h)) Accepted else Rejected("invalid hmac")
    }

  /** Plivo V2 URL signature (`plivo.rb:27-51`): the signed payload is the
    * request URL with the query string stripped (scheme://host/path), plus a
    * nonce header; signature is base64 hmac-sha256. Distinct reject reasons
    * for missing signature vs missing nonce, as in the reference. */
  def verifyUrlNonceSignature(signature: Option[String], nonce: Option[String],
                              requestUrl: String, authToken: String): Verdict =
    (signature, nonce) match {
      case (None, _) => Rejected("missing signature")
      case (_, None) => Rejected("missing nonce")
      case (Some(sig), Some(n)) =>
        // the URL is attacker-influenced (request-target/Host); a parse
        // failure must be a 4xx verdict like every other family, never an
        // exception escaping the verifier
        try {
          val uri = java.net.URI.create(requestUrl.split("\\?")(0))
          val canonical = new java.net.URI(
            uri.getScheme, null, uri.getHost, uri.getPort, uri.getPath, null, null).toString
          val calc = java.util.Base64.getEncoder
            .encodeToString(hmacRaw("HmacSHA256", authToken, canonical + n))
          if (constantTimeEquals(calc, sig)) Accepted else Rejected("invalid signature")
        } catch {
          case _: IllegalArgumentException | _: java.net.URISyntaxException =>
            Rejected("malformed url")
        }
    }

  /** Increase style (`lib/webhookdb/increase.rb:71-88`): the signature header
    * is `t=<rfc3339>,v1=<hex>[,v1=<hex>...]` — timestamp is ISO-8601 (not
    * epoch), MULTIPLE v1 values are accepted (key rotation), the signed
    * payload is `"<t-utc-iso8601>.<body>"`, and the staleness window is
    * asymmetric: `too old` past 35 days, `too new` past 4 days ahead. Reject
    * reasons mirror the reference's. */
  def verifyIsoSignedHeader(header: Option[String], body: String, secret: String,
                            nowEpoch: Long, oldCutoffSec: Long = 35L * 86400,
                            newCutoffSec: Long = 4L * 86400): Verdict =
    header match {
      case None => Rejected("missing header")
      case Some(h) =>
        val parts = h.split(",").toSeq.flatMap { kv =>
          kv.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
        }
        val t = parts.collectFirst { case ("t", v) => v }.flatMap { v =>
          try Some(java.time.OffsetDateTime.parse(v).toInstant)
          catch { case _: java.time.format.DateTimeParseException => None }
        }
        val v1s = parts.collect { case ("v1", v) => v }
        t match {
          case None => Rejected("missing timestamp")
          case Some(ts) =>
            if (v1s.isEmpty) Rejected("missing signatures")
            else if (ts.getEpochSecond < nowEpoch - oldCutoffSec) Rejected("too old")
            else if (ts.getEpochSecond > nowEpoch + newCutoffSec) Rejected("too new")
            else {
              // ruby's t.utc.iso8601: second precision, 'Z' suffix
              val iso = ts.truncatedTo(java.time.temporal.ChronoUnit.SECONDS)
                .atOffset(java.time.ZoneOffset.UTC)
                .format(java.time.format.DateTimeFormatter.ISO_INSTANT)
              val calc = hmacSha256Hex(secret, s"$iso.$body")
              if (v1s.exists(constantTimeEquals(calc, _))) Accepted
              else Rejected("invalid signature")
            }
        }
    }

  /** Front style (`lib/webhookdb/front.rb:29-42`): `X-Front-Signature` is the
    * BASE64 hmac-sha256 of `"<X-Front-Request-Timestamp>:<body>"`. No
    * staleness check in the reference — the timestamp binds the signature,
    * it is not an expiry. */
  def verifyTimestampedBase64(signature: Option[String], timestamp: Option[String],
                              body: String, secret: String): Verdict =
    signature match {
      case None => Rejected("missing signature")
      case Some(sig) =>
        // a missing timestamp header interpolates as empty, as in ruby
        val base = s"${timestamp.getOrElse("")}:$body"
        val calc = java.util.Base64.getEncoder
          .encodeToString(hmacRaw("HmacSHA256", secret, base))
        if (constantTimeEquals(calc, sig)) Accepted else Rejected("invalid signature")
    }

  /** EmailOctopus style (`lib/webhookdb/email_octopus.rb:16-22`, dispatched
    * from `email_octopus_event_v1.rb:109-117`): the signature header carries
    * `sha256=<hex hmac-sha256(body)>` — same scheme as GitHub, different
    * header and reject reasons. */
  def verifyPrefixedSha256(header: Option[String], body: String, secret: String): Verdict =
    header match {
      case None => Rejected("missing signature")
      case Some(h) =>
        if (constantTimeEquals("sha256=" + hmacSha256Hex(secret, body), h)) Accepted
        else Rejected("invalid signature")
    }

  /** Postmark style (`lib/webhookdb/postmark.rb:15-19`): no signature at all —
    * the request's source IP must be on the service's published allowlist. */
  def verifyIpAllowlist(remoteIp: String, allowed: Set[String]): Verdict =
    if (allowed.contains(remoteIp)) Accepted else Rejected("invalid ip")

  /** HTTP Basic credential equality (`twilio_sms_v1.rb`): the Authorization
    * header's decoded `user:pass` must equal the stored secret. A missing or
    * non-Basic header gets the "challenge" reason (the reference answers 401
    * + WWW-Authenticate); a wrong credential gets "invalid". */
  def verifyBasicAuth(authorization: Option[String], secret: String): Verdict =
    authorization match {
      case Some(a) if a.startsWith("Basic ") =>
        val decoded =
          try new String(java.util.Base64.getDecoder.decode(a.stripPrefix("Basic ").trim), "UTF-8")
          catch { case _: IllegalArgumentException => "" }
        if (constantTimeEquals(decoded, secret)) Accepted else Rejected("invalid")
      case _ => Rejected("challenge")
    }
}

package graft.sources

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Webhook request verification (S1 dispatch, `base.rb:114-136`): each
  * replicator authenticates inbound requests before they enter the pipeline;
  * rejects are answered 4xx with a rejection-reason header and still
  * audit-logged (`api/helpers.rb:210-213`).
  *
  * Two public verification families modeled here:
  *  - HMAC signature with timestamp tolerance (Stripe `t=..,v1=..` style);
  *  - static secret header equality (constant-time).
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
}

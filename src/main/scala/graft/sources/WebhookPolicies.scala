package graft.sources

import graft.sources.WebhookAuth._

/** Per-descriptor webhook verification dispatch — the engine-side analog of
  * `lib/webhookdb/replicator/base.rb:114-136` (`webhook_response` delegating
  * to each replicator's `_webhook_response`): EVERY registry descriptor
  * resolves to exactly one verification policy, so mounting an integration
  * never leaves auth unspecified. The families re-express the per-service
  * mixins:
  *
  *  - Stripe mixin (`stripe_v1_mixin.rb:22-24` → `stripe.rb:18-35`): epoch
  *    `t=..,v1=..` signed header with tolerance;
  *  - Increase mixin (`increase_v1_mixin.rb:6-8` → `increase.rb:71-88`):
  *    ISO-8601 `t=..,v1=..` with asymmetric 35d/4d cutoffs, multi-v1;
  *  - GitHub mixin (`github_repo_v1_mixin.rb:59-68`): `sha256=<hex>`;
  *  - Intercom mixin (`intercom_v1_mixin.rb:52-56`): `sha1=<hex>` with the
  *    app-level client secret;
  *  - EmailOctopus event (`email_octopus_event_v1.rb:109-117`):
  *    `sha256=<hex>` under its own header; the rest of the family is
  *    backfill-only (`email_octopus_campaign_v1.rb:50-52`);
  *  - Shopify mixin (`shopify_v1_mixin.rb:27-38`): base64 body HMAC;
  *  - Front mixin (`front_v1_mixin.rb:15-17` → `front.rb:29-42`): base64
  *    HMAC of `"timestamp:body"`; the signalwire channel app uses the same
  *    scheme under its own app secret
  *    (`front_signalwire_message_channel_app_v1.rb:172-174`);
  *  - Twilio/SignalWire messages (`twilio_sms_v1.rb:20-40`,
  *    `signalwire_message_v1.rb:22-42`): HTTP Basic equality;
  *  - Plivo (`plivo_sms_inbound_v1.rb:41-43` → `plivo.rb:27-51`): URL+nonce
  *    signature;
  *  - Postmark (`postmark.rb:15-19`): source-IP allowlist;
  *  - standard secret header (`webhook_response.rb:15-21` for
  *    `icalendar_calendar_v1.rb:36-38`; `webhookdb_customer_v1.rb:17-22`
  *    under its own header);
  *  - no verification (`convertkit_v1_mixin.rb:11-14`,
  *    `transistor_v1_mixin.rb:6-9`, `sponsy_v1_mixin.rb:52-55`,
  *    `atom_single_feed_v1.rb:83-85`, `aws_pricing_v1.rb:84-87`,
  *    `jotform_webhook_v1.rb:86`, `signalwire_media_v1.rb:61`,
  *    `icalendar_event_v1.rb:112`, `url_recorder_v1.rb:79`): the reference
  *    answers ok unconditionally — upstream offers no authentication or the
  *    integration is backfill-only;
  *  - auth-root stubs (`intercom_marketplace_root_v1.rb:34`,
  *    `front_marketplace_root_v1.rb` — no `_webhook_response` override):
  *    receiving a data webhook is an error.
  */
object WebhookPolicies {

  /** Everything a verifier family may need from the inbound request. Header
    * keys lower-cased (the [[graft.streaming.WebhookReceiver]] convention).
    * `nowEpoch` is REQUIRED, not defaulted: a forgotten clock would make
    * every time-checked family (Stripe, Increase) silently reject all
    * genuine webhooks as out-of-tolerance — the caller must hand over the
    * clock explicitly, even for time-free policies that ignore it. */
  final case class WebhookContext(
      headers: Map[String, String],
      body: String,
      nowEpoch: Long,
      requestUrl: String = "",
      remoteIp: String = "")

  sealed trait Policy {
    /** Stable family id, for docs/ops and the contract spec. */
    def family: String
    /** `secret` is the integration's configured credential for this policy
      * (webhook secret, app-level secret, or backfill secret per family). */
    def verify(ctx: WebhookContext, secret: Option[String]): Verdict
  }

  /** The reference answers ok unconditionally: upstream has no signing, or
    * the integration is backfill-only and the endpoint is a no-op. */
  case object NoVerification extends Policy {
    val family = "none"
    def verify(ctx: WebhookContext, secret: Option[String]): Verdict = Accepted
  }

  /** Auth-root stubs: webhooks land on dependents, never the root — the
    * reference raises on receipt, the engine rejects. */
  case object StubNoWebhooks extends Policy {
    val family = "stub"
    def verify(ctx: WebhookContext, secret: Option[String]): Verdict =
      Rejected("stub integration: webhooks unsupported")
  }

  final case class EpochSignedHeader(header: String, toleranceSec: Long = 300)
      extends Policy {
    val family = "epoch-signed-header"
    def verify(ctx: WebhookContext, secret: Option[String]): Verdict =
      secret.fold[Verdict](Rejected("no secret set"))(s =>
        verifySignedHeader(ctx.headers.get(header), ctx.body, s, ctx.nowEpoch,
          toleranceSec))
  }

  final case class IsoSignedHeader(header: String) extends Policy {
    val family = "iso-signed-header"
    def verify(ctx: WebhookContext, secret: Option[String]): Verdict =
      secret.fold[Verdict](Rejected("no secret set"))(s =>
        verifyIsoSignedHeader(ctx.headers.get(header), ctx.body, s, ctx.nowEpoch))
  }

  final case class GithubSha256(header: String = "x-hub-signature-256")
      extends Policy {
    val family = "prefixed-sha256-github"
    def verify(ctx: WebhookContext, secret: Option[String]): Verdict =
      verifyGithubSha256(ctx.headers.get(header), ctx.body, secret)
  }

  final case class PrefixedSha256(header: String) extends Policy {
    val family = "prefixed-sha256"
    def verify(ctx: WebhookContext, secret: Option[String]): Verdict =
      secret.fold[Verdict](Rejected("no secret set"))(s =>
        verifyPrefixedSha256(ctx.headers.get(header), ctx.body, s))
  }

  final case class PrefixedSha1(header: String = "x-hub-signature")
      extends Policy {
    val family = "prefixed-sha1"
    def verify(ctx: WebhookContext, secret: Option[String]): Verdict =
      secret.fold[Verdict](Rejected("no secret set"))(s =>
        verifyPrefixedSha1(ctx.headers.get(header), ctx.body, s))
  }

  final case class Base64BodyHmacHeader(header: String = "x-shopify-hmac-sha256")
      extends Policy {
    val family = "base64-body-hmac"
    def verify(ctx: WebhookContext, secret: Option[String]): Verdict =
      secret.fold[Verdict](Rejected("no secret set"))(s =>
        verifyBase64BodyHmac(ctx.headers.get(header), ctx.body, s))
  }

  final case class FrontSignature(
      sigHeader: String = "x-front-signature",
      tsHeader: String = "x-front-request-timestamp") extends Policy {
    val family = "timestamped-base64"
    def verify(ctx: WebhookContext, secret: Option[String]): Verdict =
      secret.fold[Verdict](Rejected("no secret set"))(s =>
        verifyTimestampedBase64(ctx.headers.get(sigHeader),
          ctx.headers.get(tsHeader), ctx.body, s))
  }

  final case class SecretHeader(header: String) extends Policy {
    val family = "secret-header"
    def verify(ctx: WebhookContext, secret: Option[String]): Verdict =
      secret.fold[Verdict](Rejected("no secret set"))(s =>
        verifySecretHeader(ctx.headers.get(header), s))
  }

  case object BasicAuthPolicy extends Policy {
    val family = "basic-auth"
    def verify(ctx: WebhookContext, secret: Option[String]): Verdict =
      secret.fold[Verdict](Rejected("no secret set"))(s =>
        verifyBasicAuth(ctx.headers.get("authorization"), s))
  }

  case object PlivoUrlNonce extends Policy {
    val family = "url-nonce-signature"
    def verify(ctx: WebhookContext, secret: Option[String]): Verdict =
      secret.fold[Verdict](Rejected("no secret set"))(s =>
        verifyUrlNonceSignature(ctx.headers.get("x-plivo-signature-v2"),
          ctx.headers.get("x-plivo-signature-v2-nonce"), ctx.requestUrl, s))
  }

  final case class IpAllowlist(allowed: Set[String]) extends Policy {
    val family = "ip-allowlist"
    def verify(ctx: WebhookContext, secret: Option[String]): Verdict =
      verifyIpAllowlist(ctx.remoteIp, allowed)
  }

  /** Postmark's published webhook source IPs (`postmark.rb:9-13`). */
  val PostmarkAllowedIps: Set[String] =
    Set("127.0.0.1", "3.134.147.250", "50.31.156.6", "50.31.156.77",
      "18.217.206.57")

  /** Resolve a registry descriptor name to its verification policy — the
    * dispatch the reference encodes as per-family mixins. Names outside the
    * registry resolve to None; [[graft.replicators.Replicators.registry]]
    * totality is asserted by `RegistryContractSpec`. */
  def policyFor(name: String): Option[Policy] = name match {
    // explicit entries first: roots and family exceptions
    case "front_marketplace_root_v1" | "intercom_marketplace_root_v1" =>
      Some(StubNoWebhooks)
    case "increase_app_v1" =>
      // the OAuth root DOES receive the event stream (`increase_app_v1.rb:46-48`),
      // verified with the app-level secret under the same scheme
      Some(IsoSignedHeader("increase-webhook-signature"))
    case "front_signalwire_message_channel_app_v1" =>
      Some(FrontSignature()) // signalwire_channel_app_secret, same scheme
    case "email_octopus_event_v1" => Some(PrefixedSha256("emailoctopus-signature"))
    case "twilio_sms_v1" | "signalwire_message_v1" => Some(BasicAuthPolicy)
    case "signalwire_media_v1" => Some(NoVerification) // `signalwire_media_v1.rb:61`
    case "plivo_sms_inbound_v1" => Some(PlivoUrlNonce) // secret = backfill secret
    case "icalendar_calendar_v1" => Some(SecretHeader("whdb-webhook-secret"))
    case "webhookdb_customer_v1" => Some(SecretHeader("whdb-secret"))
    // family dispatch, as the reference's mixin includes
    case n if n.startsWith("stripe_") => Some(EpochSignedHeader("stripe-signature"))
    case n if n.startsWith("increase_") =>
      Some(IsoSignedHeader("increase-webhook-signature"))
    case n if n.startsWith("github_") => Some(GithubSha256())
    case n if n.startsWith("intercom_") => Some(PrefixedSha1()) // app client secret
    case n if n.startsWith("shopify_") => Some(Base64BodyHmacHeader())
    case n if n.startsWith("front_") => Some(FrontSignature())
    case n if n.startsWith("postmark_") => Some(IpAllowlist(PostmarkAllowedIps))
    case n if n.startsWith("email_octopus_") => Some(NoVerification) // backfill-only
    case n if n.startsWith("convertkit_") => Some(NoVerification) // unsupported upstream
    case n if n.startsWith("transistor_") => Some(NoVerification) // unverifiable upstream
    case n if n.startsWith("sponsy_") => Some(NoVerification) // backfill-only
    case n if n.startsWith("icalendar_event_") => Some(NoVerification) // derived rows
    case "atom_single_feed_v1" | "aws_pricing_v1" | "jotform_webhook_v1" |
        "url_recorder_v1" => Some(NoVerification)
    case _ => None
  }
}

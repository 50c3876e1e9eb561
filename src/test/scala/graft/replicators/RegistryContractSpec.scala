package graft.replicators

import graft.SparkSpec
import graft.operators.{Pipeline, Projection}

/** Per-replicator golden-row checks across the registry (the reference's
  * "a replicator" shared example applied to each descriptor). */
class RegistryContractSpec extends SparkSpec {
  import spark.implicits._

  private def webhookDf(bodies: String*) =
    bodies.zipWithIndex.map { case (b, i) => (b, i.toLong) }
      .toDF("body", Projection.IngestSeqCol)

  private def ingest(spec: graft.operators.ReplicatorSpec, bodies: String*) =
    Pipeline.upsertBatch(spec, Pipeline.emptyTarget(spec, spark), webhookDf(bodies: _*))

  test("every registry entry has a remote key column and distinct names") {
    Replicators.registry.values.foreach { spec =>
      assert(spec.columns.exists(_.name == spec.remoteKeyCol), spec.name)
      val names = spec.columns.map(_.name)
      assert(names.distinct == names, s"${spec.name} duplicate columns")
      spec.timestampCol.foreach(t => assert(names.contains(t), s"${spec.name} ts col"))
    }
    assert(Replicators.registry.size == 66) // every reference descriptor
                                            // (replicator.rb:153-171) + the
                                            // stripe partitioned variant;
                                            // `fake` stays spec-helper-only
  }

  test("twilio_sms_v1 parses RFC3339-ish timestamps and keys on sid") {
    val row = ingest(Replicators.twilioSmsV1,
      """{"sid":"SM1","date_created":"2024-01-01T10:00:00Z","date_sent":null,
         |"date_updated":"2024-01-02T10:00:00Z","direction":"outbound-api",
         |"from":"+15551234","to":"+15559876","status":"sent"}""".stripMargin.replaceAll("\n", ""))
      .collect()(0)
    assert(row.getAs[String]("twilio_id") == "SM1")
    assert(row.getAs[java.sql.Timestamp]("date_updated").getTime ==
      java.time.Instant.parse("2024-01-02T10:00:00Z").toEpochMilli)
    assert(row.getAs[java.sql.Timestamp]("date_sent") == null)
  }

  test("github_issue_v1 digs nested ids and plucks label/assignee arrays") {
    val row = ingest(Replicators.githubIssueV1,
      """{"id":101,"node_id":"N1","number":7,"state":"open",
         |"user":{"id":42,"login":"x"},"closed_by":null,
         |"assignees":[{"id":1},{"id":2}],"labels":[{"id":10,"name":"bug"}],
         |"milestone":{"number":3},
         |"created_at":"2024-01-01T00:00:00Z","closed_at":null,
         |"updated_at":"2024-01-05T00:00:00Z"}""".stripMargin.replaceAll("\n", ""))
      .collect()(0)
    assert(row.getAs[Long]("github_id") == 101L)
    assert(row.getAs[Long]("user_id") == 42L)
    assert(row.getAs[scala.collection.Seq[Long]]("assignee_ids").toSeq == Seq(1L, 2L))
    assert(row.getAs[scala.collection.Seq[Long]]("label_ids").toSeq == Seq(10L))
    assert(row.getAs[Long]("milestone_number") == 3L)
  }

  test("intercom_contact_v1: partial delete webhook stamps deleted_at, keeps fields") {
    val spec = Replicators.intercomContactV1
    val full = """{"id":"c1","external_id":"u9","email":"a@b.co","created_at":1700000000,"updated_at":1700000000}"""
    val del = """{"id":"c1","deleted_at":1700001000}"""
    val t1 = ingest(spec, full)
    val t2 = Pipeline.upsertBatch(spec, t1, webhookDf(del))
    val row = t2.collect()(0)
    assert(row.getAs[String]("email") == "a@b.co")       // skip-nil kept it
    assert(row.getAs[String]("external_id") == "u9")
    assert(row.getAs[java.sql.Timestamp]("deleted_at").getTime == 1700001000000L)
  }

  test("email_octopus_contact_v1 compound key + row_updated_at defaulter") {
    val row = ingest(Replicators.emailOctopusContactV1,
      """{"id":"m1","list_id":"l1","email_address":"a@b.co","status":"SUBSCRIBED",
         |"created_at":"2024-01-01T00:00:00Z"}""".stripMargin.replaceAll("\n", ""))
      .collect()(0)
    assert(row.getAs[String]("compound_identity") == "l1-m1")
    assert(row.getAs[java.sql.Timestamp]("row_updated_at") != null) // defaulted now
  }

  test("partitioned variant adds part_hash and keys the merge on it (U5)") {
    val spec = Replicators.stripeChargeV1Partitioned
    val body = """{"id":"ch_9","object":"charge","amount":1,"created":1700000000,"status":"ok"}"""
    val out = ingest(spec, body)
    val row = out.collect()(0)
    assert(out.columns.contains("part_hash"))
    val expected = graft.functions.expressions.Str2IntHash.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("ch_9"))
    assert(row.getAs[Int]("part_hash") == expected)
    assert(spec.mergeSpec.keyCols == Seq("part_hash", "stripe_id"))
    // idempotent under the partitioned conflict target
    val again = Pipeline.upsertBatch(spec, out, webhookDf(body))
    assert(again.count() == 1)
  }

  test("email_octopus_event_v1 derives its md5 remote key from four fields") {
    val body = """{"occurred_at":"2024-01-01T00:00:00Z","event_type":"opened",
      |"contact":{"id":"c1","email_address":"a@b.co"},"campaign_id":"camp1"}""".stripMargin.replaceAll("\n", "")
    val row = ingest(Replicators.emailOctopusEventV1, body).collect()(0)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("2024-01-01T00:00:00Zopenedc1camp1".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(row.getAs[String]("unique_id") == expected)
    assert(row.getAs[String]("contact_email_address") == "a@b.co")
  }

  test("increase_transaction_v1 derives the legacy date column from created_at") {
    val row = ingest(Replicators.increaseTransactionV1,
      """{"id":"txn_1","account_id":"acc_1","amount":-250,"created_at":"2024-03-05T23:30:00Z","updated_at":"2024-03-06T00:00:00Z","route_id":null}""")
      .collect()(0)
    assert(row.getAs[java.sql.Date]("date").toString == "2024-03-05") // UTC date
    assert(row.getAs[Long]("amount") == -250L)
  }

  test("convertkit_tag_v1 stores enrichment-sourced subscription counts") {
    val spec = Replicators.convertkitTagV1
    val enriched = graft.sources.Enrichment.withEnrichment(
      webhookDf("""{"id":5,"created_at":"2024-01-01T00:00:00Z","name":"vip"}"""),
      () => _ => Some("""{"total_subscriptions":42}"""))
    val row = Pipeline.upsertBatch(spec, Pipeline.emptyTarget(spec, spark), enriched)
      .collect()(0)
    assert(row.getAs[Long]("total_subscriptions") == 42L)
    assert(row.getAs[String]("enrichment").contains("42"))
  }

  test("github_issue_comment_v1 and increase_ach_transfer_v1 golden rows") {
    val c = ingest(Replicators.githubIssueCommentV1,
      """{"id":7,"issue":{"id":101},"created_at":"2024-01-01T00:00:00Z","updated_at":"2024-01-02T00:00:00Z","user":{"id":42},"node_id":"N7"}""")
      .collect()(0)
    assert(c.getAs[Long]("issue_id") == 101L)
    val a = ingest(Replicators.increaseAchTransferV1,
      """{"id":"ach_1","account_number":"123","account_id":"acc_1","amount":5000,"created_at":"2024-01-01T00:00:00Z","updated_at":"2024-01-01T00:00:00Z","routing_number":"021000021","status":"submitted","transaction_id":"txn_9"}""")
      .collect()(0)
    assert(a.getAs[Long]("amount") == 5000L)
    assert(a.getAs[String]("routing_number") == "021000021")
  }

  test("postmark array-index dig and jotform epoch-millis timestamps") {
    val pm = ingest(Replicators.postmarkInboundMessageV1,
      """{"MessageID":"m1","FromFull":{"Email":"f@x.co"},"ToFull":[{"Email":"t@x.co"},{"Email":"cc@x.co"}],"Subject":"S","Date":"2024-01-01T00:00:00Z","Tag":"tg"}""")
      .collect()(0)
    assert(pm.getAs[String]("to_email") == "t@x.co") // ToFull[0].Email
    val jf = ingest(Replicators.jotformWebhookV1,
      """{"formID":"f1","submissionID":"s1","rawRequest":{"event_id":"e1","submitDate":"1700000000123","buildDate":"1699990000456"}}""")
      .collect()(0)
    assert(jf.getAs[java.sql.Timestamp]("submit_date").getTime == 1700000000000L)
  }

  test("transistor_show_v1 digs the JSON:API attributes block") {
    val row = ingest(Replicators.transistorShowV1,
      """{"id":"show-1","type":"show","attributes":{"author":"A","title":"T","description":"D","created_at":"2024-01-01T00:00:00Z","updated_at":"2024-01-02T00:00:00Z","website":"https://x"}}""")
      .collect()(0)
    assert(row.getAs[String]("title") == "T")
    assert(row.getAs[java.sql.Timestamp]("updated_at").getTime ==
      java.time.Instant.parse("2024-01-02T00:00:00Z").toEpochMilli)
  }

  test("email_octopus_list_v1 reads nested count fields") {
    val row = ingest(Replicators.emailOctopusListV1,
      """{"id":"l1","name":"News","created_at":"2024-01-01T00:00:00Z","counts":{"pending":1,"subscribed":20,"unsubscribed":3}}""")
      .collect()(0)
    assert(row.getAs[Long]("subscribed") == 20L)
    assert(row.getAs[Long]("pending") == 1L)
  }

  test("front_message_v1 unwraps payload.target.data with event-envelope digs") {
    val body = """{"payload":{"conversation":{"id":"cnv_1"},"target":{"data":
      |{"id":"msg_1","type":"email","created_at":1700000000}}}}""".stripMargin.replaceAll("\n", "")
    val row = ingest(Replicators.frontMessageV1, body).collect()(0)
    assert(row.getAs[String]("front_id") == "msg_1")
    assert(row.getAs[String]("front_conversation_id") == "cnv_1")
    assert(row.getAs[java.sql.Timestamp]("created_at").getTime == 1700000000000L)
  }

  test("convertkit_subscriber_v1 digs nested custom fields") {
    val row = ingest(Replicators.convertkitSubscriberV1,
      """{"id":9,"created_at":"2024-01-01T00:00:00Z","email_address":"a@b.co",
        |"first_name":"A","fields":{"last_name":"B"},"state":"active"}""".stripMargin.replaceAll("\n", ""))
      .collect()(0)
    assert(row.getAs[Long]("convertkit_id") == 9L)
    assert(row.getAs[String]("last_name") == "B")
  }

  test("stripe family: invoice and subscription golden rows through the shared unwrap") {
    val inv = """{"id":"in_1","object":"invoice","amount_due":1000,"amount_paid":400,"amount_remaining":600,"charge":"ch_1","created":1700000000,"customer":"cus_1","customer_email":"a@b.co","customer_name":"A","number":"INV-1","period_start":1699000000,"period_end":1700000000,"status":"open"}"""
    val r1 = ingest(Replicators.stripeInvoiceV1,
      s"""{"object":"event","created":1700000001,"data":{"object":$inv}}""").collect()(0)
    assert(r1.getAs[Long]("amount_remaining") == 600L)
    assert(r1.getAs[java.sql.Timestamp]("period_start").getTime == 1699000000000L)

    val sub = """{"id":"sub_1","object":"subscription","billing_cycle_anchor":1700000000,"cancel_at":null,"canceled_at":null,"created":1700000000,"current_period_end":1702592000,"current_period_start":1700000000,"customer":"cus_1","default_payment_method":"pm_1","discount":null,"ended_at":null,"latest_invoice":"in_1","schedule":null,"status":"active"}"""
    val r2 = ingest(Replicators.stripeSubscriptionV1, sub).collect()(0)
    assert(r2.getAs[String]("status") == "active")
    assert(r2.getAs[java.sql.Timestamp]("cancel_at") == null)
  }

  test("stripe_customer_v1 and stripe_refund_v1 share the envelope unwrap") {
    val cust = """{"id":"cus_1","object":"customer","balance":5,"created":1700000000,"email":"c@x.co","name":"C","phone":null}"""
    val wrapped = s"""{"object":"event","created":1700009999,"data":{"object":$cust}}"""
    val row = ingest(Replicators.stripeCustomerV1, wrapped).collect()(0)
    assert(row.getAs[String]("stripe_id") == "cus_1")
    assert(row.getAs[Long]("balance") == 5L)
    assert(row.getAs[java.sql.Timestamp]("updated").getTime == 1700009999000L)

    val refund = """{"id":"re_1","object":"refund","amount":100,"charge":"ch_1","created":1700000000,"status":"succeeded","balance_transaction":null,"payment_intent":null,"receipt_number":null}"""
    val r = ingest(Replicators.stripeRefundV1, refund).collect()(0)
    assert(r.getAs[String]("charge") == "ch_1")
    assert(r.getAs[Long]("amount") == 100L)
  }

  test("sponsy_publication_v1 maps day arrays three ways (column.rb map lookups)") {
    val row = ingest(Replicators.sponsyPublicationV1,
      """{"id":"pub1","name":"N","slug":"n","type":"NEWSLETTER",
        |"days":["MONDAY","WEDNESDAY","SUNDAY"],
        |"createdAt":"2024-01-01T00:00:00Z","updatedAt":"2024-01-02T00:00:00Z"}"""
        .stripMargin.replaceAll("\n", ""))
      .collect()(0)
    assert(row.getAs[String]("sponsy_id") == "pub1")
    // MONDAY-first 0-based; SUNDAY-first 1-based-with-wrap; index->name
    assert(row.getAs[scala.collection.Seq[Int]]("days").toSeq == Seq(0, 2, 6))
    assert(row.getAs[scala.collection.Seq[Int]]("days_normalized").toSeq == Seq(1, 3, 0))
    assert(row.getAs[scala.collection.Seq[String]]("day_names").toSeq ==
      Seq("MONDAY", "WEDNESDAY", "SUNDAY")) // names pass through unmapped
  }

  test("every registry descriptor resolves to a webhook verification policy") {
    import graft.sources.WebhookPolicies
    // base.rb:114-136 dispatches verification per replicator; a descriptor
    // without a policy would mount with auth unspecified. Totality over the
    // whole registry, with the roots EXPLICITLY the stub policy (receiving
    // a data webhook on an auth root is an error, not an accept).
    val resolved = Replicators.registry.keySet.map(n => n -> WebhookPolicies.policyFor(n))
    val missing = resolved.collect { case (n, None) => n }
    assert(missing.isEmpty, s"descriptors without a verification policy: $missing")
    Seq("front_marketplace_root_v1", "intercom_marketplace_root_v1").foreach { n =>
      assert(WebhookPolicies.policyFor(n).contains(WebhookPolicies.StubNoWebhooks), n)
    }
    // the OAuth event root verifies with the Increase scheme, not a stub
    assert(WebhookPolicies.policyFor("increase_app_v1").get.family == "iso-signed-header")
    // spot-check family shapes against the reference mixin structure
    assert(WebhookPolicies.policyFor("stripe_payout_v1").get.family == "epoch-signed-header")
    assert(WebhookPolicies.policyFor("github_pull_v1").get.family == "prefixed-sha256-github")
    assert(WebhookPolicies.policyFor("shopify_order_v1").get.family == "base64-body-hmac")
    assert(WebhookPolicies.policyFor("front_message_v1").get.family == "timestamped-base64")
    assert(WebhookPolicies.policyFor("email_octopus_event_v1").get.family == "prefixed-sha256")
    assert(WebhookPolicies.policyFor("email_octopus_list_v1").get.family == "none")
    assert(WebhookPolicies.policyFor("postmark_outbound_message_event_v1").get.family == "ip-allowlist")
    assert(WebhookPolicies.policyFor("icalendar_calendar_v1").get.family == "secret-header")
    assert(WebhookPolicies.policyFor("twilio_sms_v1").get.family == "basic-auth")
    assert(WebhookPolicies.policyFor("plivo_sms_inbound_v1").get.family == "url-nonce-signature")
  }

  test("auth-root stubs ingest nothing but hold registry identity") {
    Seq("front_marketplace_root_v1", "intercom_marketplace_root_v1",
      "increase_app_v1").foreach { n =>
      val spec = Replicators.registry(n)
      assert(spec.remoteKeyCol == "ignore_id")
      assert(spec.columns.size == 1, n)
    }
  }

  test("icalendar_event_v1 descriptor round-trips an expanded occurrence row") {
    val row = ingest(Replicators.icalendarEventV1,
      """{"compound_identity":"cal1-u1-0","calendar_external_id":"cal1",
        |"uid":"u1-0","status":"CONFIRMED","start_at":"2024-06-01T10:00:00Z",
        |"end_at":"2024-06-01T11:00:00Z","missing_timezone":false,
        |"categories":["work"],"priority":1,"recurring_event_id":"u1",
        |"recurring_event_sequence":0,
        |"last_modified_at":"2024-05-01T00:00:00Z"}""".stripMargin.replaceAll("\n", ""))
      .collect()(0)
    assert(row.getAs[String]("compound_identity") == "cal1-u1-0")
    assert(row.getAs[java.sql.Timestamp]("start_at").getTime ==
      java.time.Instant.parse("2024-06-01T10:00:00Z").toEpochMilli)
    assert(row.getAs[scala.collection.Seq[String]]("categories").toSeq == Seq("work"))
    assert(row.getAs[Int]("recurring_event_sequence") == 0)
    // partitioned variant keys on (part_hash, compound_identity)
    val part = Replicators.registry("icalendar_event_v1_partitioned")
    assert(part.partitioned && part.mergeSpec.keyCols ==
      Seq("part_hash", "compound_identity"))
  }

  test("aws_pricing_v1 descriptor covers the rate-card schema") {
    val spec = Replicators.awsPricingV1
    assert(spec.remoteKeyCol == "rate_code")
    assert(spec.columns.map(_.name).containsSlice(
      Seq("term_type", "term_code", "offer_term_code")))
    assert(spec.columns.size == 24)
  }
}

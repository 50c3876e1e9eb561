package graft.replicators

import graft.functions.Converters
import graft.operators.{ColumnSpec, ReplicatorSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Concrete replicator descriptors — Spark ports of representative reference
  * replicators (the registry pattern of `lib/webhookdb/replicator.rb:153-171`).
  * Each is a pure data value: schema + dig paths + converters + merge policy.
  */
object Replicators {

  val registry: Map[String, ReplicatorSpec] = Seq(
    stripeChargeV1, transistorEpisodeStatsV1, atomSingleFeedV1
  ).map(r => r.name -> r).toMap

  /** `stripe_charge_v1` (`lib/webhookdb/replicator/stripe_charge_v1.rb:23-60`):
    * event-wrapped unwrap at `data.object` (`stripe_v1_mixin.rb:6-10`),
    * `updated` prefers the event envelope's `created`, monotonic update on
    * `updated`. */
  lazy val stripeChargeV1: ReplicatorSpec = ReplicatorSpec(
    name = "stripe_charge_v1",
    remoteKeyCol = "stripe_id",
    columns = Seq(
      ColumnSpec("stripe_id", StringType, Seq("id")),
      ColumnSpec("amount", LongType, Seq("amount")),
      ColumnSpec("balance_transaction", StringType, Seq("balance_transaction")),
      ColumnSpec("billing_email", StringType, Seq("billing_details", "email")),
      ColumnSpec("created", TimestampType, Seq("created"), convert = Converters.unixTs),
      ColumnSpec("customer", StringType, Seq("customer")),
      ColumnSpec("invoice", StringType, Seq("invoice")),
      ColumnSpec("payment_type", StringType, Seq("payment_method_details", "type")),
      ColumnSpec("receipt_email", StringType, Seq("receipt_email")),
      ColumnSpec("status", StringType, Seq("status")),
      ColumnSpec("updated", TimestampType, Seq("created"), eventKey = Seq("created"),
        convert = Converters.unixTs)),
    timestampCol = Some("updated"),
    updateWhere = (t, s) => t("updated") < s("updated"),
    eventPred = body => get_json_object(body, "$.object") === "event",
    resourcePath = Seq("data", "object"))

  /** `transistor_episode_stats_v1`
    * (`lib/webhookdb/replicator/transistor_episode_stats_v1.rb:23-67`):
    * compound remote key `"{episode_id}-{date}"`, dd-MM-yyyy date parse,
    * update only when downloads changed. */
  lazy val transistorEpisodeStatsV1: ReplicatorSpec = ReplicatorSpec(
    name = "transistor_episode_stats_v1",
    remoteKeyCol = "compound_identity",
    columns = Seq(
      ColumnSpec("compound_identity", StringType, Seq("episode_id", "date"),
        resourceExpr = Some(r => Converters.compoundKey(
          get_json_object(r, "$.episode_id"),
          Converters.strpdate(get_json_object(r, "$.date"), "dd-MM-yyyy")))),
      ColumnSpec("episode_id", StringType, Seq("episode_id")),
      ColumnSpec("date", DateType, Seq("date"),
        convert = c => Converters.strpdate(c, "dd-MM-yyyy")),
      ColumnSpec("downloads", LongType, Seq("downloads"))),
    timestampCol = Some("date"),
    updateWhere = (t, s) => !(t("downloads") <=> s("downloads")))

  /** `atom_single_feed_v1` (`lib/webhookdb/replicator/atom_single_feed_v1.rb:21-63`):
    * set-once `row_created_at`, geo point split from "lat lng"
    * (space-separated, `converter_array_element`). */
  lazy val atomSingleFeedV1: ReplicatorSpec = ReplicatorSpec(
    name = "atom_single_feed_v1",
    remoteKeyCol = "entry_id",
    columns = Seq(
      ColumnSpec("entry_id", StringType, Seq("id")),
      ColumnSpec("row_created_at", TimestampType, Seq("updated"),
        convert = Converters.parseTime, setOnce = true),
      ColumnSpec("updated", TimestampType, Seq("updated"), convert = Converters.parseTime),
      ColumnSpec("published", TimestampType, Seq("published"), convert = Converters.parseTime),
      ColumnSpec("title", StringType, Seq("title")),
      ColumnSpec("geo_lat", DecimalType(12, 6), Seq("georss:point"),
        convert = c => Converters.arrayElement(c, " ", 0, DecimalType(12, 6))),
      ColumnSpec("geo_lng", DecimalType(12, 6), Seq("georss:point"),
        convert = c => Converters.arrayElement(c, " ", 1, DecimalType(12, 6)))),
    timestampCol = Some("updated"),
    updateWhere = (t, s) => !(t("data") <=> s("data")))
}

package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.Row

/** S9 — enrichment fetch (`base.rb:849-859`, `github_repo_v1_mixin.rb:217-235`):
  * before insert, look up extra data per row from an external service; auth
  * errors and 404s tolerate to a null enrichment.
  *
  * Spark shape: a `mapPartitions` lookup stage — the fetcher is constructed
  * once per partition (connection/client amortization), rows stream through
  * it, and the stage composes in front of `Projection.project`, which digs
  * `fromEnrichment` columns out of the added `enrichment` JSON column.
  * Effectively a lookup join against an external API, rate-limited by
  * partition count.
  */
object Enrichment {

  /** A tolerated enrichment miss (the reference's 401/403/404 path,
    * `github_repo_v1_mixin.rb:224-230`: expired tokens and deleted items
    * must not stop the upsert): the row lands with null enrichment. */
  final class Tolerated(val status: Int)
      extends RuntimeException(s"tolerated enrichment status $status")

  /** Per-partition fetcher factory: build one client, then body -> optional
    * enrichment JSON. `None` or a thrown [[Tolerated]] mean "no enrichment"
    * (the row still lands, enrichment columns null); ANY OTHER exception
    * propagates and fails the batch — the reference `raise`s non-tolerated
    * HTTP errors so the job retries, rather than silently storing nulls for
    * a transient outage. */
  type FetcherFactory = () => String => Option[String]

  def withEnrichment(webhooks: DataFrame, mkFetcher: FetcherFactory): DataFrame = {
    val spark = webhooks.sparkSession
    val bodyIdx = webhooks.schema.fieldIndex("body")
    val outSchema = StructType(webhooks.schema.fields :+
      StructField("enrichment", StringType))
    val enriched = webhooks.rdd.mapPartitions { rows =>
      val fetch = mkFetcher()
      rows.map { r =>
        val e = try fetch(r.getString(bodyIdx)) catch { case _: Tolerated => None }
        Row.fromSeq(r.toSeq :+ e.orNull)
      }
    }
    spark.createDataFrame(enriched, outSchema)
  }
}

package graft.replicators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `aws_pricing_v1` (S7/G2, `lib/webhookdb/replicator/aws_pricing_v1.rb`):
  * a giant price-list JSON — `products{sku->attrs}` plus
  * `terms{termType->sku->termCode->priceDimensions{rateCode->rate}}` —
  * exploded to one row per (product x term x priceDimension), currency map
  * split into (amount, currency).
  *
  * The reference streams the 200MB document textually on one node to avoid
  * loading it; in Spark the explosion is declarative: `from_json` with map
  * schemas + three `explode`s, so a whole price file (or thousands of them)
  * fans out across executors and Tungsten handles memory.
  */
object AwsPricing {

  private val rateSchema = StructType(Seq(
    StructField("rateCode", StringType),
    StructField("description", StringType),
    StructField("beginRange", StringType),
    StructField("endRange", StringType),
    StructField("unit", StringType),
    StructField("pricePerUnit", MapType(StringType, StringType)),
    StructField("appliesTo", ArrayType(StringType))))

  private val termSchema = StructType(Seq(
    StructField("offerTermCode", StringType),
    StructField("sku", StringType),
    StructField("effectiveDate", StringType),
    StructField("priceDimensions", MapType(StringType, rateSchema))))

  val priceListSchema: StructType = StructType(Seq(
    StructField("publicationDate", StringType),
    StructField("version", StringType),
    StructField("products", MapType(StringType, StructType(Seq(
      StructField("sku", StringType),
      StructField("productFamily", StringType),
      StructField("attributes", MapType(StringType, StringType)))))),
    StructField("terms", MapType(StringType,
      MapType(StringType, MapType(StringType, termSchema))))))

  /** One price-list JSON document per input row (`json` column) -> one row
    * per priceDimension, joined back to its product attributes. */
  def expand(priceLists: DataFrame): DataFrame = {
    val parsed = priceLists
      .withColumn("doc", from_json(col("json"), priceListSchema))
    val products = parsed.select(
      col("doc.publicationDate").as("publication_date"),
      explode(col("doc.products")).as(Seq("product_sku", "product")))
      .select(col("publication_date"), col("product_sku"),
        col("product.productFamily").as("product_family"),
        to_json(col("product.attributes")).as("product_attributes"))
    val rates = parsed
      .select(col("doc.publicationDate").as("publication_date"),
        explode(col("doc.terms")).as(Seq("term_type", "by_sku")))
      .select(col("publication_date"), col("term_type"),
        explode(col("by_sku")).as(Seq("sku", "by_term_code")))
      .select(col("publication_date"), col("term_type"), col("sku"),
        explode(col("by_term_code")).as(Seq("term_code", "term")))
      .select(col("publication_date"), col("term_type"), col("sku"),
        col("term_code"),
        col("term.offerTermCode").as("offer_term_code"),
        col("term.effectiveDate").as("effective_date"),
        explode(col("term.priceDimensions")).as(Seq("rate_code", "rate")))
      .select(col("publication_date"), col("term_type"), col("sku"),
        col("term_code"), col("offer_term_code"), col("effective_date"),
        col("rate_code"),
        col("rate.description").as("description"),
        col("rate.unit").as("unit"),
        col("rate.beginRange").try_cast(DecimalType(24, 10)).as("begin_range"),
        col("rate.endRange").try_cast(DecimalType(24, 10)).as("end_range"),
        col("rate.appliesTo").as("applies_to"),
        // currency map {"USD": "0.023"} -> (amount, currency); single entry
        element_at(map_keys(col("rate.pricePerUnit")), 1).as("price_per_unit_currency"),
        element_at(map_values(col("rate.pricePerUnit")), 1)
          .try_cast(DecimalType(24, 10)).as("price_per_unit_amount"))
    rates.join(
      products.withColumnRenamed("product_sku", "sku")
        .drop("publication_date"),
      Seq("sku"), "left")
  }
}

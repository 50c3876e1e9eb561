package graft.replicators

import graft.SparkSpec

/** G2/S7 contract: nested price-list explode, one row per priceDimension,
  * currency split (FIXTURES.md A6). */
class AwsPricingSpec extends SparkSpec {
  import spark.implicits._

  private val priceList =
    """{
      "publicationDate": "2024-01-01T00:00:00Z",
      "version": "1",
      "products": {
        "SKU1": {"sku": "SKU1", "productFamily": "Compute",
                 "attributes": {"instanceType": "m5.large"}},
        "SKU2": {"sku": "SKU2", "productFamily": "Storage", "attributes": {}}
      },
      "terms": {
        "OnDemand": {
          "SKU1": {
            "SKU1.T1": {
              "offerTermCode": "T1", "sku": "SKU1", "effectiveDate": "2024-01-01",
              "priceDimensions": {
                "SKU1.T1.R1": {"rateCode": "SKU1.T1.R1", "description": "per hour",
                  "beginRange": "0", "endRange": "Inf", "unit": "Hrs",
                  "pricePerUnit": {"USD": "0.0960000000"}, "appliesTo": []},
                "SKU1.T1.R2": {"rateCode": "SKU1.T1.R2", "description": "tiered",
                  "beginRange": "100", "endRange": "200", "unit": "Hrs",
                  "pricePerUnit": {"USD": "0.0480000000"}, "appliesTo": ["SKU1.T1.R1"]}
              }
            }
          },
          "SKU2": {
            "SKU2.T1": {
              "offerTermCode": "T1", "sku": "SKU2", "effectiveDate": "2024-01-01",
              "priceDimensions": {
                "SKU2.T1.R1": {"rateCode": "SKU2.T1.R1", "description": "per GB",
                  "beginRange": "0", "endRange": "Inf", "unit": "GB-Mo",
                  "pricePerUnit": {"EUR": "0.0230000000"}, "appliesTo": []}
              }
            }
          }
        }
      }
    }"""

  test("explodes products x terms x priceDimensions with currency split") {
    val out = AwsPricing.expand(Seq(priceList).toDF("json")).orderBy("rate_code")
    val rows = out.collect()
    assert(rows.length == 3)
    val r1 = rows(0)
    assert(r1.getAs[String]("rate_code") == "SKU1.T1.R1")
    assert(r1.getAs[String]("product_family") == "Compute")
    assert(r1.getAs[String]("product_attributes").contains("m5.large"))
    assert(r1.getAs[String]("price_per_unit_currency") == "USD")
    assert(r1.getAs[java.math.BigDecimal]("price_per_unit_amount").doubleValue() == 0.096)
    assert(r1.getAs[java.math.BigDecimal]("end_range") == null) // "Inf" -> null
    val r2 = rows(1)
    assert(r2.getAs[java.math.BigDecimal]("begin_range").intValue() == 100)
    assert(r2.getAs[scala.collection.Seq[String]]("applies_to").toSeq == Seq("SKU1.T1.R1"))
    val r3 = rows(2)
    assert(r3.getAs[String]("price_per_unit_currency") == "EUR")
    assert(r3.getAs[String]("term_type") == "OnDemand")
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The co-located-join contract: joins and aggregations over bucketed tables
  * plan without shuffle exchanges. */
class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-sorted tables join and aggregate without exchanges") {
    // warehouse dir is a static conf; the default (spark-warehouse under
    // the build dir) is fine for this test, tables are dropped after
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1 to 10000).map(i => (i.toLong % 500, i.toLong, i * 1.5))
        .toDF("k", "id", "v")
      val dims = (0L until 500L).map(k => (k, s"dim-$k")).toDF("k", "name")
      BucketedStore.writeBucketed(facts, "bspec_facts", "k", 8)
      BucketedStore.writeBucketed(dims, "bspec_dims", "k", 8)

      val f = BucketedStore.read(spark, "bspec_facts")
      val d = BucketedStore.read(spark, "bspec_dims")
      val joined = f.join(d, Seq("k")).groupBy(col("name"))
        .agg(count(lit(1)).as("n"))
      assert(joined.count() == 500)
      assert(BucketedStore.isExchangeFree(
        f.join(d, Seq("k")).select(col("k"), col("name"), col("v"))))

      // non-bucketed equivalent DOES shuffle (sanity check of the check)
      val plainF = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "id")
      val plainD = (0L until 50L).map(k => (k, s"d$k")).toDF("k", "n")
      assert(!BucketedStore.isExchangeFree(plainF.join(plainD, Seq("k"))))
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_facts")
      spark.sql("DROP TABLE IF EXISTS bspec_dims")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}

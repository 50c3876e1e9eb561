package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale evidence for SCALE.md's scan-layer claims: Spark's runtime Bloom-
  * filter injection prunes the big (application) side of a shuffle join
  * using a filter built from the selective side — the mechanism that keeps
  * fact-side scans cheap at 100 TB when the dim side is filtered. Runs on a
  * child session with the size thresholds lowered to toy scale. */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dim filter injects a bloom filter on the fact side") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s.conf.set("spark.sql.shuffle.partitions", "8")

    val fact = s.range(100000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val dim = s.range(1000).select(col("id").as("k"), (col("id") % 7).as("grp"))
    val joined = fact.join(dim.filter(col("grp") === 3), "k")

    assert(joined.count() === 143) // grp==3: ids 3,10,...,997
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("might_contain") &&
      optimized.contains("bloom_filter_agg"),
      s"no runtime bloom filter injected:\n$optimized")
  }
}

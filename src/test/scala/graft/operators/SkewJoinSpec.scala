package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCALE.md's skew claim, executed: a join with one hot key really does get
  * split by AQE's skew-join optimization (no salting code needed), and the
  * result is unchanged. Runs on a child session so the lowered AQE
  * thresholds don't leak into parallel suites. */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed join partition at runtime") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    // make the hot partition "skewed" at toy scale
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    // left: 200k rows on ONE key + a uniform tail; right: small dim
    val left = s.range(200000).select(lit(1L).as("k"), col("id").as("payload"))
      .union(s.range(1000).select((col("id") % 100 + 2).as("k"), col("id").as("payload")))
    val right = s.range(200).select(col("id").as("k"), (col("id") * 10).as("v"))
    val joined = left.join(right, "k")

    // materialize THIS QueryExecution (count() would plan a separate one
    // and leave joined's own AQE plan unexecuted)
    val n = joined.collect().length
    assert(n === 200000 + 1000) // every left row matches exactly one right row
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"), s"AQE skew split did not fire:\n$plan")
  }
}

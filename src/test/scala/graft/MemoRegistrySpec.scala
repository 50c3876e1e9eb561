package graft

import org.apache.spark.sql.functions._

/** Bench isolation is structural: ANY module that memoizes DataFrames is
  * reset between queries through the registry, so a future memoizing
  * module cannot silently reintroduce cross-query cache coupling by not
  * being named in Bench. */
class MemoRegistrySpec extends SparkSpec {

  test("resetAll invokes every registered hook, every time") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    // a fake memoizing module registering its reset hook
    MemoRegistry.register(() => { calls.incrementAndGet(); () })
    MemoRegistry.register(() => { calls.incrementAndGet(); () })
    val before = calls.get()
    MemoRegistry.resetAll()
    MemoRegistry.resetAll()
    assert(calls.get() - before >= 4,
      "both hooks must fire on each resetAll")
  }

  test("DedupQueries' memo is registered: resetAll forces a rebuild") {
    val d = "/root/testdata/sf0.001"
    val first = graft.queries.DedupQueries.shingleHashDf(spark, d)
    val again = graft.queries.DedupQueries.shingleHashDf(spark, d)
    assert(first eq again, "memo must serve the same cached instance")
    MemoRegistry.resetAll()
    val rebuilt = graft.queries.DedupQueries.shingleHashDf(spark, d)
    assert(!(rebuilt eq first),
      "after a registry reset the module must rebuild its memo")
    // the rebuilt table is live and correct (cache registration intact)
    assert(rebuilt.filter(col("doc_id").isNotNull).count() > 0)
  }
}

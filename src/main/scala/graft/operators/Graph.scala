package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal distributed graph traversal (Pregel-style rounds of joins).
  *
  * Used for transitive benchmark contamination: a training doc that is
  * a near-dup of a near-dup of a benchmark doc is still contaminated,
  * but a pairwise screen only finds the first generation. BFS over the
  * near-dup edge set closes the gap.
  *
  * Scale shape: each round is one equi-join of the current frontier
  * (small, shrinking) against the edge list on the source id — a keyed
  * shuffle of frontier×degree rows, never a full-graph materialization.
  * `localCheckpoint` truncates the growing lineage each round (the
  * standard iterative-algorithm guard; same pattern as Dedup's
  * connected components). Rounds are bounded by `maxHops`, so driver
  * looping is O(maxHops) job submissions, not data-dependent.
  */
object Graph {

  /** Multi-source BFS over an undirected edge list.
    *
    * @param edges two-column DataFrame (src, dst); treated undirected
    * @param seeds one-column DataFrame of start ids (hop 0)
    * @return (id, hops) — minimum hop distance from any seed, for every
    *         vertex within `maxHops` hops (seeds included at 0)
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    val Seq(srcC, dstC) = edges.columns.take(2).toSeq
    val und = edges.select(col(srcC).as("s"), col(dstC).as("d"))
      .union(edges.select(col(dstC).as("s"), col(srcC).as("d")))
      .localCheckpoint(true)

    var visited = seeds.toDF("id").distinct()
      .withColumn("hops", lit(0)).localCheckpoint(true)
    var frontier = visited
    var h = 0
    while (h < maxHops && !frontier.isEmpty) {
      h += 1
      frontier = frontier.join(und, frontier("id") === und("s"))
        .select(und("d").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .withColumn("hops", lit(h)).localCheckpoint(true)
      visited = visited.union(frontier).localCheckpoint(true)
    }
    visited
  }
}

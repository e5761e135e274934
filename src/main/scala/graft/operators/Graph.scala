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

  /** Both directions of an undirected edge list, dedup'd: distinct on
    * the NORMALIZED (min, max) pair first — half the rows of the naive
    * union-both-directions-then-distinct — then emit both orientations
    * with a row-local explode (no second shuffle). Self-loops survive
    * as a single row (array_distinct collapses the two identical
    * orientations), exactly matching distinct over the naive union.
    */
  private def undirectedBoth(edges: DataFrame, aC: String, bC: String,
                             outS: String, outD: String): DataFrame =
    edges
      // least/greatest SKIP nulls, so an inert (NULL, b) input row
      // would otherwise normalize into a real (b, b) self-loop — a
      // self-vote in label propagation, a phantom degree in k-core.
      // The naive union+distinct this replaces kept such rows inert
      // (no equi-join matches NULL); dropping them preserves that.
      .filter(col(aC).isNotNull && col(bC).isNotNull)
      .select(least(col(aC), col(bC)).as("u"),
        greatest(col(aC), col(bC)).as("v"))
      .distinct()
      .select(explode(array_distinct(array(
        struct(col("u").as("s"), col("v").as("d")),
        struct(col("v").as("s"), col("u").as("d"))))).as("e"))
      .select(col("e.s").as(outS), col("e.d").as(outD))

  /** Synchronous semi-supervised label propagation: seeds keep their
    * label forever; every other vertex adopts, each round, the most
    * frequent label among its labeled neighbors FROM THE PREVIOUS
    * round (count desc, label asc tie-break — fully deterministic, so
    * an oracle can replay the rounds verbatim). Unreached vertices
    * stay null.
    *
    * Scale shape per round: one edge⋈labels equi-join, a
    * map-combinable (vertex, label) count, and a per-vertex argmax
    * window — the window runs AFTER the count collapse, so its
    * partition is bounded by the number of distinct labels (≤
    * #classes), never by vertex degree. `localCheckpoint` truncates
    * the growing lineage each round, the standard iterative guard.
    */
  def labelPropagation(edges: DataFrame, seeds: DataFrame,
                       rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val und = undirectedBoth(edges, "src", "dst", "src", "dst")
      .localCheckpoint(false) // reused every round
    val verts = und.select(col("src").as("id")).distinct()
    var cur = verts
      .join(seeds.select(col("id"), col("label"), lit(true).as("seed")),
        Seq("id"), "left")
      .select(col("id"), col("label"),
        coalesce(col("seed"), lit(false)).as("seed"))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val msgs = und
        .join(cur.filter(col("label").isNotNull)
          .select(col("id").as("src"), col("label").as("nlab")), "src")
        .groupBy(col("dst").as("id"), col("nlab"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("id")
        .orderBy(col("c").desc, col("nlab").asc)
      val best = msgs.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("id"), col("nlab"))
      cur = cur.join(best, Seq("id"), "left")
        .select(col("id"),
          when(col("seed"), col("label"))
            .otherwise(coalesce(col("nlab"), col("label"))).as("label"),
          col("seed"))
        .localCheckpoint(false)
    }
    cur
  }

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
      .localCheckpoint(false)

    var visited = seeds.toDF("id").distinct()
      .withColumn("hops", lit(0)).localCheckpoint(false)
    var frontier = visited
    var h = 0
    while (h < maxHops && !frontier.isEmpty) {
      h += 1
      frontier = frontier.join(und, frontier("id") === und("s"))
        .select(und("d").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .withColumn("hops", lit(h)).localCheckpoint(false)
      visited = visited.union(frontier).localCheckpoint(false)
    }
    visited
  }

  /** Damped PageRank over an undirected edge list, fixed iteration
    * count (web-crawl curation signal: rank sources/documents by link
    * centrality before sampling a training mix).
    *
    * Scale shape: each iteration is one equi-join of the rank vector
    * (one row per vertex) against the edge list on the source id plus a
    * map-combinable sum on the destination — the classic Pregel
    * message-passing round as two keyed shuffles, never an adjacency
    * matrix. `localCheckpoint` truncates lineage per round. Treating
    * the graph as undirected guarantees every vertex has degree ≥ 1,
    * so no dangling-mass redistribution pass is needed.
    *
    * Determinism contract (oracle-replayable): ranks are fixed-point
    * integers scaled by 1e9 and every step is BIGINT arithmetic —
    * integral division for rank/deg and the damping ratio — so each
    * iteration is bit-identical across engines and partition orders
    * (no float rounding boundary to straddle; each term truncates
    * ≤ 1e-9 of mass, which only ever shrinks ranks and never reorders
    * a gap wider than iters·1e-9).
    *
    * @param edges two-column DataFrame (src, dst); treated undirected
    * @param iters number of power iterations (typ. 3–20; cost is
    *              iters × one edge-list shuffle)
    * @param dampNum damping numerator: rank = (100-dampNum)%·1/N +
    *                dampNum%·Σ in-contribs (dampNum=85 → d=0.85)
    * @return (id, rank_e9) for every vertex; rank_e9 = rank · 1e9
    */
  /** Shared loop-invariant scaffold for the rank family: undirected
    * edge list, degree table, and their join checkpointed at the
    * session shuffle width. The repartition exists for WIDTH, not
    * partitioning reuse: under AQE a checkpoint's LogicalRDD records
    * UnknownPartitioning (measured r17 — lazy AND eager, the probe's
    * downstream groupBy re-exchanged either way), so iterations DO
    * re-exchange the edge side; but unpinned, AQE coalesces the join
    * output to ~1 partition at fixture scale and every iteration's
    * join probe + partial agg would run single-task. A
    * sortWithinPartitions before the checkpoint was removed for the
    * same reason: the ordering is equally invisible to the planner
    * downstream, so it was a pure extra sort inside the timed region.
    *
    * NOTE: deliberately the naive union-then-distinct (not
    * undirectedBoth): the scaffold immediately groupBys und on "s",
    * and the distinct's hash partitioning on (s, d) feeds that with
    * one narrow exchange; the normalized-distinct + explode variant
    * measured ~10% SLOWER here because the explode output loses that
    * co-partitioning and the 2|E| rows reshuffle in full anyway.
    * Returns (deg, undeg, nShuffle).
    */
  private def rankScaffold(edges: DataFrame)
      : (DataFrame, DataFrame, Int) = {
    val Seq(srcC, dstC) = edges.columns.take(2).toSeq
    val und = edges.select(col(srcC).as("s"), col(dstC).as("d"))
      .union(edges.select(col(dstC).as("s"), col(srcC).as("d")))
      .distinct().localCheckpoint(false)
    val deg = und.groupBy("s").agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    val nShuffle = edges.sparkSession.sessionState.conf.numShufflePartitions
    val undeg = und.join(deg, Seq("s"))
      .repartition(nShuffle, col("s"))
      .localCheckpoint(false)
    (deg, undeg, nShuffle)
  }

  def pageRank(edges: DataFrame, iters: Int,
               dampNum: Long = 85L): DataFrame = {
    require(iters >= 1 && dampNum > 0L && dampNum < 100L)
    val scale = 1000000000L
    val (deg, undeg, _) = rankScaffold(edges)
    // deg already holds exactly one row per vertex — derive the vertex
    // set from it instead of a second edge-list-wide distinct
    val nodes = deg.select(col("s").as("id"))
    val n = deg.count() // one scalar job, not a data collect
    val base = (scale * (100L - dampNum) / 100L) / n
    var ranks = nodes
      .withColumn("rank_e9", lit(scale / n)).localCheckpoint(false)
    for (_ <- 1 to iters) {
      val contrib = undeg
        .join(ranks, undeg("s") === ranks("id"))
        .select(undeg("d").as("id"), expr("rank_e9 div deg").as("c"))
      ranks = contrib.groupBy("id")
        .agg(sum(col("c")).as("in_sum"))
        .select(col("id"),
          (lit(base) + expr(s"($dampNum * in_sum) div 100")).as("rank_e9"))
        .localCheckpoint(false)
    }
    ranks
  }

  /** TrustRank: PageRank personalized to a trusted seed set — the
    * classic crawl-curation spam filter (Gyöngyi et al.). Rank mass
    * restarts ONLY to seeds, so score measures random-walk proximity
    * to trust; link farms far from any seed drain toward zero however
    * densely they interlink, which plain PageRank rewards. Same 1e-9
    * fixed-point BIGINT contract as [[pageRank]] (integral division
    * everywhere → oracle-replayable bit-for-bit), same per-round shape:
    * one rank⋈edge equi-join + one map-combinable sum; the only new
    * piece is a LEFT join from the vertex set so zero-inflow vertices
    * keep explicit rank-0 rows (under personalization a vertex CAN
    * receive nothing).
    *
    * @param seeds one-column DataFrame of trusted vertex ids (ids not
    *              present in the graph are ignored)
    * @return (id, rank_e9, seed) for every vertex
    */
  def trustRank(edges: DataFrame, seeds: DataFrame, iters: Int,
                dampNum: Long = 85L): DataFrame = {
    require(iters >= 1 && dampNum > 0L && dampNum < 100L)
    val scale = 1000000000L
    val (deg, undeg, nShuffle) = rankScaffold(edges)
    // loop-invariant vertex table, checkpointed at session width
    // (same trick as undeg — width, not partitioning reuse: the
    // checkpoint's partitioning is invisible to the planner under
    // AQE, but unpinned it materializes ~1 partition and every
    // round's join probe runs single-task)
    val nodes = deg.select(col("s").as("id"))
      // distinct: a duplicated seed id would duplicate the vertex row
      // through the join — doubling its outflow every round, halving
      // per-seed restart mass via the inflated count, and emitting
      // duplicate output rows
      .join(seeds.toDF("sid").distinct(), col("id") === col("sid"), "left")
      .select(col("id"), col("sid").isNotNull.as("seed"))
      .repartition(nShuffle, col("id"))
      .localCheckpoint(false) // read every round for the restart mass
    val nSeeds = nodes.filter(col("seed")).count()
    require(nSeeds > 0, "trustRank: no seed id present in the graph")
    val baseSeed = (scale * (100L - dampNum) / 100L) / nSeeds
    // seed rides inside the rank vector so no final re-join is needed
    var ranks = nodes
      .select(col("id"), col("seed"),
        when(col("seed"), lit(scale / nSeeds)).otherwise(lit(0L))
          .as("rank_e9"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val insum = undeg
        .join(ranks, undeg("s") === ranks("id"))
        .select(undeg("d").as("id"), expr("rank_e9 div deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("in_sum"))
      ranks = nodes.join(insum, Seq("id"), "left")
        .select(col("id"), col("seed"),
          (when(col("seed"), lit(baseSeed)).otherwise(lit(0L)) +
            expr(s"($dampNum * coalesce(in_sum, 0L)) div 100"))
            .as("rank_e9"))
        .localCheckpoint(false)
    }
    ranks.select(col("id"), col("rank_e9"), col("seed"))
  }

  /** Triangle census of an undirected graph: one row with
    * (n_nodes, n_edges, n_triangles). Input edges may repeat, point
    * either way, or contain self-loops — they are normalized first
    * (u<v, dedup, self-loops dropped).
    *
    * Scale shape: degree-ordered orientation. Every edge points from
    * its (degree, id)-smaller endpoint, so each wedge is generated at
    * its unique lowest-ranked apex and the wedge join's fanout per
    * vertex is bounded by its OUT-degree — at most O(√|E|) after
    * orientation even for power-law hubs (the Suri–Vassilvitskii
    * bound). Wedge generation and the closing-edge probe are plain
    * equi-joins; neighborhoods are never enumerated in memory.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val (e, deg, od) = oriented(edges)
    val tri = closedTriangles(od).agg(count(lit(1)).as("n_triangles"))
    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(e.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri)
  }

  /** Normalize an edge list (undirected, dedup'd, no self-loops) and
    * orient every edge from its (degree, id)-smaller endpoint. Returns
    * (normalized edges (u, v), per-node degrees (n, deg), oriented
    * edges (src, dst, ddeg)). deg is |V|-sized: left to AQE, which
    * broadcasts the deg joins while it fits and falls back to a
    * shuffle join when |V| outgrows that.
    */
  private def oriented(edges: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val Seq(aC, bC) = edges.columns.take(2).toSeq
    val e = edges
      .select(least(col(aC), col(bC)).as("u"),
        greatest(col(aC), col(bC)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = e.select(col("u").as("n"))
      .union(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val du = deg.select(col("n").as("u"), col("deg").as("udeg"))
    val dv = deg.select(col("n").as("v"), col("deg").as("vdeg"))
    val uFirst = col("udeg") < col("vdeg") ||
      (col("udeg") === col("vdeg") && col("u") < col("v"))
    // oriented edge + the π-rank (deg, id) of its dst, needed to
    // order the two legs of a wedge without another deg join
    val od = e.join(du, "u").join(dv, "v")
      .select(
        when(uFirst, col("u")).otherwise(col("v")).as("src"),
        when(uFirst, col("v")).otherwise(col("u")).as("dst"),
        when(uFirst, col("vdeg")).otherwise(col("udeg")).as("ddeg"))
    (e, deg, od)
  }

  /** Every triangle exactly once as (apex, w1, w2): wedges generated
    * at their unique (degree, id)-lowest apex, closed by probing the
    * oriented edge list — fanout per vertex bounded by its OUT-degree
    * (≤ O(√|E|) after orientation, the Suri–Vassilvitskii bound). */
  private def closedTriangles(od: DataFrame): DataFrame = {
    val wedges = od.as("a").join(od.as("b"),
      col("a.src") === col("b.src") &&
        (col("a.ddeg") < col("b.ddeg") ||
          (col("a.ddeg") === col("b.ddeg") &&
            col("a.dst") < col("b.dst"))))
      .select(col("a.src").as("apex"),
        col("a.dst").as("w1"), col("b.dst").as("w2"))
    wedges.join(od, col("w1") === col("src") && col("w2") === col("dst"))
      .select(col("apex"), col("w1"), col("w2"))
  }

  /** Local clustering coefficient per node: cc = 2·T(v) / (d(v)·(d(v)−1))
    * over nodes with degree ≥ 2, emitted as the exact e4 fixed point
    * `(20000·T) div (d·(d−1))` — integer floor division of non-negative
    * longs, bit-identical in any engine (no float in the pipeline).
    * The corpus-curation read: a crawl-graph node whose neighborhood
    * is a clique (cc → 1) is a link farm / mirror cluster; cc → 0 with
    * high degree is a genuine hub. Scale shape: the same oriented
    * wedge join as [[triangleStats]] (each triangle materializes once,
    * then explodes to its 3 corners — 3 rows per triangle, map-side
    * combinable into per-node counts), plus one |V|-sized left join
    * against the degree table.
    */
  def localClustering(edges: DataFrame): DataFrame = {
    val (_, deg, od) = oriented(edges)
    val perNode = closedTriangles(od)
      .select(explode(array(col("apex"), col("w1"), col("w2"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("tri"))
    deg.filter(col("deg") >= 2)
      .join(perNode, Seq("n"), "left")
      .select(col("n").as("id"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"),
        expr("(20000 * coalesce(tri, 0L)) div (deg * (deg - 1))")
          .as("cc_e4"))
  }

  /** Bounded synchronous k-core peeling: `rounds` rounds of "drop every
    * vertex with degree < k, drop edges touching dropped vertices",
    * returning (id, deg) for the surviving subgraph. The k-core is the
    * curation analogue of "keep only well-corroborated entities" — a
    * supplier/part that survives k-core pruning is linked to ≥ k
    * partners which THEMSELVES have ≥ k partners, the standard
    * anti-spam / dense-community filter before trusting link signals
    * (PageRank, Adamic-Adar) from a crawl graph.
    *
    * Fixed round count, NOT a data-dependent while-loop: peeling is
    * monotone (each round only removes), so once a round removes
    * nothing every later round is an exact no-op — running extra
    * rounds is cost without change, never wrong. A fixed budget makes
    * the computation an oracle-replayable pure function of (edges, k,
    * rounds) and keeps driver job-submission O(rounds) instead of
    * data-dependent; GraphSpec asserts the budget actually reaches the
    * fixpoint on the fixtures (rounds and rounds−1 agree), so drift in
    * a regenerated fixture fails one loud spec, not a silent
    * under-peel.
    *
    * Scale shape per round: one map-combinable degree count + two
    * semi-joins of the edge list against the (shrinking) survivor set
    * — all equi-joins on vertex id, never an adjacency
    * materialization; `localCheckpoint` truncates lineage per round.
    */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"k and rounds must be >= 1; got k=$k rounds=$rounds")
    val Seq(srcC, dstC) = edges.columns.take(2).toSeq
    var und = undirectedBoth(edges, srcC, dstC, "s", "d")
      .localCheckpoint(false)
    // fixpoint short-circuit: a round that removes no edge makes every
    // later round an exact no-op (same edge set → same degree counts →
    // same survivor set), so breaking early returns the IDENTICAL
    // result as running the full budget — the oracle's unrolled rounds
    // agree by the same argument. The count is cheap: `und` is already
    // checkpointed.
    var prevCount = und.count()
    var r = 0
    var stable = false
    while (r < rounds && !stable) {
      und = peelRound(und, k).localCheckpoint(false)
      val c = und.count()
      stable = c == prevCount
      prevCount = c
      r += 1
    }
    und.groupBy(col("s").as("id")).agg(count(lit(1)).as("deg"))
  }

  /** One synchronous peel round on an undirected (s, d) edge list:
    * degree count, then both endpoints SEMI-joined against the
    * >= k survivors. Exposed so PlanSpec can pin the per-round join
    * shape (the checkpointed loop hides it from the final plan).
    */
  private[graft] def peelRound(und: DataFrame, k: Int): DataFrame = {
    val keep = und.groupBy("s").agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k).select(col("s").as("kid"))
      .localCheckpoint(false) // probed by BOTH endpoint semi-joins
    und
      .join(keep, und("s") === keep("kid"), "left_semi")
      .join(keep, und("d") === keep("kid"), "left_semi")
  }

  /** HITS (Kleinberg hubs & authorities) over a DIRECTED edge list —
    * the rank family's second member with genuinely different
    * semantics from [[pageRank]]: authority = being pointed at by good
    * hubs, hub = pointing at good authorities, mutually reinforcing.
    * On a curation graph (queries → documents, customers → suppliers)
    * the authority side surfaces canonical targets and the hub side
    * broad connectors — neither is a random-walk stationary mass.
    *
    * Fixed-point contract matches the family: every score an integral
    * e9 (max-normalized each half-round: `raw · 1e9 div max(raw)`,
    * computed in DECIMAL(38,0) so `raw · 1e9` cannot overflow a long
    * even at degree 1e9), so the oracle unrolls the rounds
    * bit-for-bit. Per half-round shape: one score⋈edge equi-join +
    * one map-combinable keyed sum + a 1-row max broadcast — the edge
    * list is the checkpointed loop invariant, only vertex-sized score
    * vectors move. Vertices appearing only as sources carry hub
    * scores, only as targets authority scores (a bipartite trading
    * graph splits them cleanly).
    *
    * @return (id, kind, score_e9): kind "auth" for targets,
    *         "hub" for sources
    */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1)
    val scale = 1000000000L
    val Seq(srcC, dstC) = edges.columns.take(2).toSeq
    val e = edges.select(col(srcC).as("s"), col(dstC).as("d"))
      .distinct().localCheckpoint(false)
    def normalized(raw: DataFrame, outCol: String): DataFrame = {
      val mx = raw.agg(max(col("raw")).as("mx"))
      raw.crossJoin(broadcast(mx))
        .select(col("id"),
          expr(s"cast(cast(raw as decimal(38,0)) * $scale div mx as bigint)")
            .as(outCol))
        .localCheckpoint(false)
    }
    var hubs = e.select(col("s").as("id")).distinct()
      .withColumn("hub_e9", lit(scale)).localCheckpoint(false)
    var auths: DataFrame = null
    for (_ <- 1 to iters) {
      auths = normalized(
        e.join(hubs, e("s") === hubs("id"))
          .groupBy(e("d").as("id")).agg(sum(col("hub_e9")).as("raw")),
        "auth_e9")
      hubs = normalized(
        e.join(auths, e("d") === auths("id"))
          .groupBy(e("s").as("id")).agg(sum(col("auth_e9")).as("raw")),
        "hub_e9")
    }
    auths.select(col("id"), lit("auth").as("kind"),
        col("auth_e9").as("score_e9"))
      .unionByName(hubs.select(col("id"), lit("hub").as("kind"),
        col("hub_e9").as("score_e9")))
  }
}

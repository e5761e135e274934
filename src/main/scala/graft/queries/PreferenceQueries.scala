package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.Text

/** Preference / annotation-QA operators: the checks a team runs over
  * pairwise-comparison (RLHF / eval) data before trusting it — latent
  * strength fitting (Bradley-Terry), rater-agreement measurement
  * (Cohen's kappa), intransitivity auditing (tournament triad census),
  * and per-source distribution distance (Jensen-Shannon). The fixture
  * corpus has no judgment column, so deterministic "matches" are first
  * CONSTRUCTED from the documents table (doc d vs doc (d+stride) mod N
  * for strides {1,3,4,7}; the longer text wins, doc_id breaks ties) and
  * two "annotators" are deterministic quality heuristics — both engines
  * replay the construction exactly, so the oracles gate the operator
  * math, not a random draw. Strides are chosen so offset sums close
  * (1+3=4, 3+4=7): the induced source tournament has complete triads,
  * making the cycle audit non-vacuous.
  *
  * Comparator discipline (house rules, see StatsQueries): exact
  * integer ppm via non-negative `div`; ln() rounded to fixed decimals
  * before any aggregation; aggregated doubles travel as exact DECIMAL
  * (order-invariant) scaled to BIGINT per term; iterative fixed-point
  * in e6 integers with the oracle unrolling the rounds (the
  * g_pagerank contract).
  *
  * Scale shapes: match-building is ONE equi-join on a computed key
  * ((doc_id+stride) mod N — 4× map-side fanout, shuffle on the id),
  * after which every frame is model-sized (#sources ≤ hundreds): the
  * wins matrix, the BT iteration state, the triad joins, and the JS
  * bucket grid are all broadcast-scale. Nothing quadratic in docs.
  */
object PreferenceQueries {

  private val strides = Seq(1L, 3L, 4L, 7L)
  private val btIters = 5

  /** Per-source pairwise wins matrix (winner, loser, c) built from the
    * deterministic stride matches — model-sized (≤ sources²) output;
    * the only corpus-scale work is the id equi-join. */
  private def winsMatrix(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        Text.tokenCount(col("text")).cast("long").as("tc"))
      .localCheckpoint(false) // both sides of the pairing join
    val n = d.agg(count(lit(1)).as("n_docs"))
    val probes = d.crossJoin(broadcast(n))
      .withColumn("st", explode(array(strides.map(lit): _*)))
      .select(col("doc_id").as("ida"), col("source").as("sa"),
        col("tc").as("ta"),
        expr("(doc_id + st) % n_docs").as("doc_id"))
    val aWins = col("ta") > col("tb") ||
      (col("ta") === col("tb") && col("ida") < col("idb"))
    probes
      .join(d.select(col("doc_id"), col("source").as("sb"),
        col("tc").as("tb"), col("doc_id").as("idb")), "doc_id")
      .filter(col("sa") =!= col("sb"))
      .select(when(aWins, col("sa")).otherwise(col("sb")).as("w"),
        when(aWins, col("sb")).otherwise(col("sa")).as("l"))
      .groupBy("w", "l").agg(count(lit(1)).as("c"))
  }

  /** Majority-decided edges of the source tournament: x → y iff x beat
    * y strictly more often than y beat x (ties drop the pair). */
  private def majorityEdges(wl: DataFrame): DataFrame = {
    val dir1 = wl.select(col("w").as("x"), col("l").as("y"), col("c"))
    val dir2 = wl.select(col("l").as("x"), col("w").as("y"),
      (col("c") * -1L).as("c"))
    dir1.union(dir2).groupBy("x", "y").agg(sum("c").as("net"))
      .filter(col("net") > 0L)
      .select("x", "y")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Bradley-Terry latent strength from pairwise wins: 5 MM
    //      rounds (Hunter 2004) in e6 integer fixed point, normalized
    //      each round to sum k·1e6 — the reward-data sanity fit that
    //      turns "A beat B 61-39" tables into a single strength
    //      ranking. All iteration state is #sources rows; each round
    //      is two broadcast joins + one tiny agg. The oracle unrolls
    //      the 5 rounds exactly (the g_pagerank contract). At corpora
    //      where wins exceed ~1e6 matches the e12 products move to
    //      DECIMAL(38,0) — noted, not needed at BIGINT counts. ----
    "p_bradley_terry" -> ((s, dir) => {
      // ONE corpus-scale job (the stride pairing join inside
      // winsMatrix); the wins matrix is model-sized (≤ sources²
      // rows), so the 5 MM rounds fold on the driver — the BPE
      // merge-selection / k-means centroid precedent — instead of
      // paying 5 shuffle rounds for 20-row iteration state.
      val wlRows = winsMatrix(s, dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val games = (wlRows.map { case (w, l, c) => ((w, l), c) } ++
        wlRows.map { case (w, l, c) => ((l, w), c) })
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      val verts = games.keys.map(_._1).toVector.distinct.sorted
      val wn = verts.map(v =>
        v -> wlRows.collect { case (w, _, c) if w == v => c }.sum).toMap
      var p = verts.map(v => v -> 1000000L).toMap
      for (_ <- 1 to btIters) {
        val den = verts.map { i =>
          i -> games.collect { case ((gi, gj), g) if gi == i =>
            g * 1000000000000L / math.max(p(gi) + p(gj), 1L)
          }.sum
        }.toMap
        val up = verts.map(i =>
          i -> wn(i) * 1000000000000L / math.max(den(i), 1L)).toMap
        val tot = up.values.sum
        val k = verts.length
        p = verts.map(i =>
          i -> up(i) * k * 1000000L / math.max(tot, 1L)).toMap
      }
      val gTot = verts.map(v =>
        v -> games.collect { case ((gi, _), g) if gi == v => g }.sum).toMap
      import s.implicits._
      verts.map(v => (v, gTot(v), wn(v), p(v)))
        .toDF("source", "games", "wins", "bt_e6")
    }),

    // ---- Cohen's kappa between two deterministic "annotators" (A:
    //      token count ≥ 55, B: n_chars ≥ 300) per source: observed vs
    //      chance agreement from the 2×2 table, exact integer ppm.
    //      kappa can be negative, and signed integer division floors
    //      in DuckDB but truncates in Spark — so the sign travels
    //      separately and the division runs on |numerator| (the
    //      e_snaive_backtest discipline). One map-combinable agg. ----
    "p_cohen_kappa" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("source"),
          (Text.tokenCount(col("text")) >= 55).as("a"),
          (col("n_chars") >= 300L).as("b"))
        .groupBy("source").agg(
          count(lit(1)).as("n"),
          sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
          sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"),
          sum(when(col("a"), 1L).otherwise(0L)).as("a1"),
          sum(when(col("b"), 1L).otherwise(0L)).as("b1"))
        .withColumn("num",
          expr("n * (n11 + n00) - (a1 * b1 + (n - a1) * (n - b1))"))
        .withColumn("den",
          expr("n * n - (a1 * b1 + (n - a1) * (n - b1))"))
        .select(col("source"), col("n"), col("n11"), col("n00"),
          expr("(n11 + n00) * 1000000L div n").as("po_ppm"),
          signum(col("num")).cast("int").as("kappa_sign"),
          when(col("den") > 0L,
            expr("abs(num) * 1000000L div den")).otherwise(lit(0L))
            .as("kappa_abs_ppm"))
    }),

    // ---- tournament triad census: over the majority-win digraph on
    //      sources, how many source triples are fully decided, and how
    //      many of those are CYCLES (a>b>c>a) vs transitive — the
    //      intransitivity audit that tells you whether a single scalar
    //      ranking (e.g. the BT fit above) can represent the
    //      preference data at all. Every join is on the ≤ sources²
    //      edge list; cycles are counted once via the min-first
    //      rotation. One summary row. ----
    "p_triad_census" -> ((s, dir) => {
      val e = majorityEdges(winsMatrix(s, dir)).localCheckpoint(false)
      val u = e.select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      val tri = u.as("u1")
        .join(u.as("u2"), col("u1.a") === col("u2.a") &&
          col("u1.b") < col("u2.b"))
        .join(u.as("u3"), col("u3.a") === col("u1.b") &&
          col("u3.b") === col("u2.b"))
        .agg(count(lit(1)).as("n_triads"))
      val cyc = e.as("e1")
        .join(e.as("e2"), col("e1.y") === col("e2.x"))
        .join(e.as("e3"), col("e2.y") === col("e3.x") &&
          col("e3.y") === col("e1.x"))
        .filter(col("e1.x") < col("e1.y") && col("e1.x") < col("e2.y"))
        .agg(count(lit(1)).as("n_cyclic"))
      e.agg(count(lit(1)).as("n_edges"))
        .crossJoin(broadcast(tri)).crossJoin(broadcast(cyc))
        .select(col("n_edges"), col("n_triads"), col("n_cyclic"),
          (col("n_triads") - col("n_cyclic")).as("n_transitive"),
          expr("n_cyclic * 1000000L div greatest(n_triads, 1L)")
            .as("cyclic_ppm"))
    }),

    // ---- Fleiss' kappa over 3 deterministic raters assigning each
    //      doc a quality tier {0,1,2} (token-count, char-count, and
    //      lexical-diversity heuristics): the multi-rater agreement
    //      readout Cohen's kappa (2 raters) can't give. Closed-form
    //      over integer category counts with a single common
    //      denominator, so kappa = (S·Nk/(k-1) − Σc_j²) /
    //      ((Nk)² − Σc_j²) is exact rational → sign + e6 magnitude
    //      (the p_cohen_kappa discipline). One map-combinable agg per
    //      source; the per-item Σ_j n_ij² term is computed inline
    //      from the three tier columns (k=3 raters → n_ij sums to 3).
    //      N² products stay in BIGINT to ~3e9 items/source; past
    //      that the audit shards by source anyway (noted, not
    //      needed). ----
    "p_fleiss_kappa" -> ((s, dir) => {
      val k = 3L
      val tiers = t(s, dir, "documents")
        .select(col("source"),
          Text.tokenCount(col("text")).cast("long").as("tc"),
          col("n_chars"),
          size(array_distinct(Text.tokens(col("text")))).cast("long")
            .as("dt"))
        .select(col("source"),
          (when(col("tc") < 40L, 0L).when(col("tc") < 70L, 1L)
            .otherwise(2L)).as("r1"),
          (when(col("n_chars") < 250L, 0L).when(col("n_chars") < 450L, 1L)
            .otherwise(2L)).as("r2"),
          (when(col("dt") * 10L < col("tc") * 7L, 0L)
            .when(col("dt") * 10L < col("tc") * 9L, 1L)
            .otherwise(2L)).as("r3"))
      // per-item category counts n_ij (j in 0..2) from the 3 ratings
      val nij = Seq(0L, 1L, 2L).map { j =>
        Seq("r1", "r2", "r3").map(r =>
          when(col(r) === j, 1L).otherwise(0L)).reduce(_ + _).as(s"n$j")
      }
      tiers.select(col("source") +: nij: _*)
        .groupBy("source").agg(
          count(lit(1)).as("n_items"),
          sum(expr("n0*n0 + n1*n1 + n2*n2")).as("sq"),
          sum("n0").as("c0"), sum("n1").as("c1"), sum("n2").as("c2"))
        .withColumn("s_num", col("sq") - col("n_items") * k)
        // multiplied through by (k-1) so num/den stay exact integers
        .withColumn("num",
          expr(s"s_num * n_items * $k " +
            s"- ${k - 1} * (c0*c0 + c1*c1 + c2*c2)"))
        .withColumn("den",
          expr(s"${k - 1} * (n_items * $k * n_items * $k " +
            "- (c0*c0 + c1*c1 + c2*c2))"))
        .select(col("source"), col("n_items"), col("c0"), col("c1"),
          col("c2"),
          expr(s"s_num * 1000000L div (n_items * $k * ${k - 1})")
            .as("pbar_ppm"),
          signum(col("num")).cast("int").as("kappa_sign"),
          when(col("den") > 0L, expr("abs(num) * 1000000L div den"))
            .otherwise(lit(0L)).as("kappa_abs_ppm"))
    }),

    // ---- Copeland + Borda rank aggregation over the source
    //      tournament: copeland_net = majority wins − majority losses
    //      (the voting-theory ranking robust to intransitivity that
    //      the BT fit assumes away), borda = raw match wins. Emitted
    //      with dense ranks under each scheme so downstream can
    //      diff the two orderings. Everything past the shared match
    //      join is model-sized (≤ sources rows). ----
    "p_copeland_borda" -> ((s, dir) => {
      val wl = winsMatrix(s, dir).localCheckpoint(false)
      val e = majorityEdges(wl)
      val verts = wl.select(col("w").as("source"))
        .union(wl.select(col("l").as("source"))).distinct()
      val outd = e.groupBy(col("x").as("source"))
        .agg(count(lit(1)).as("mw"))
      val ind = e.groupBy(col("y").as("source"))
        .agg(count(lit(1)).as("ml"))
      val borda = wl.groupBy(col("w").as("source"))
        .agg(sum("c").as("wins"))
      val g = verts
        .join(outd, Seq("source"), "left")
        .join(ind, Seq("source"), "left")
        .join(borda, Seq("source"), "left")
        .select(col("source"),
          coalesce(col("mw"), lit(0L)).as("maj_wins"),
          coalesce(col("ml"), lit(0L)).as("maj_losses"),
          coalesce(col("wins"), lit(0L)).as("borda"))
        .withColumn("copeland_net", col("maj_wins") - col("maj_losses"))
      // unpartitioned windows: BOUNDED — `g` has one row per source
      // (catalog-sized), never per comparison
      g.withColumn("copeland_rank", dense_rank().over(
          Window.orderBy(col("copeland_net").desc, col("source").asc)))
        .withColumn("borda_rank", dense_rank().over(
          Window.orderBy(col("borda").desc, col("source").asc)))
    }),

    // ---- per-source Jensen-Shannon divergence vs the corpus over
    //      doc-length buckets (width 20, capped at 9): the mix audit
    //      that flags sources whose length profile departs from the
    //      blend they feed — symmetric and bounded, unlike the KL it
    //      is built from. Both KL halves emitted in exact e12 plus
    //      their sum 2·JS (never divided, so near-zero rounding
    //      residue can go negative without a floor/trunc fork). Each
    //      ln ratio is an exact-integer rational (2kN / (kN + Kn)),
    //      rounded at 9 decimals; each term is DECIMAL-scaled to a
    //      BIGINT e12 BEFORE the sum, so partition order never touches
    //      the hash. The grid is sources × ≤10 buckets — broadcast
    //      scale; the corpus contributes two keyed counts. ----
    "p_js_divergence" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("source"),
          Text.tokenCount(col("text")).cast("long").as("tc"))
        .select(col("source"),
          expr("least(tc div 20, 9L)").as("bucket"))
        .localCheckpoint(false) // feeds three independent aggs
      val per = d.groupBy("source", "bucket").agg(count(lit(1)).as("k"))
      val ns = d.groupBy("source").agg(count(lit(1)).as("ns"))
      val qb = d.groupBy("bucket").agg(count(lit(1)).as("kb"))
      val nTot = d.agg(count(lit(1)).as("nn"))
      def termE12(frac: Column, lnArgNum: String, lnArgDen: String) =
        (round(frac * round(log(
          expr(s"cast($lnArgNum as double) / cast($lnArgDen as double)")),
          9), 12).cast("decimal(20,12)") * lit(1000000000000L))
          .cast("long")
      ns.crossJoin(broadcast(qb)).crossJoin(broadcast(nTot))
        .join(per, Seq("source", "bucket"), "left")
        .withColumn("k", coalesce(col("k"), lit(0L)))
        .withColumn("tp", when(col("k") > 0L,
          termE12(expr("cast(k as double) / cast(ns as double)"),
            "2 * k * nn", "k * nn + kb * ns")).otherwise(lit(0L)))
        .withColumn("tq",
          termE12(expr("cast(kb as double) / cast(nn as double)"),
            "2 * kb * ns", "k * nn + kb * ns"))
        .groupBy("source").agg(
          sum("tp").as("kl_p_e12"), sum("tq").as("kl_q_e12"))
        .withColumn("js_x2_e12", expr("kl_p_e12 + kl_q_e12"))
    })
  )

  /** Shared oracle scaffolding: the deterministic match construction
    * and wins matrix, verbatim in DuckDB. AS MATERIALIZED throughout:
    * wl/e/g feed multiply-referenced downstream CTEs, and without it
    * DuckDB inlines the whole pairing-join chain once per reference
    * (exponential in the unrolled BT rounds — the g_pagerank lesson). */
  private val winsSql =
    """dd AS MATERIALIZED (
      |       SELECT doc_id, source, len(string_split(text, ' ')) AS tc
      |       FROM documents),
      |nn AS (SELECT COUNT(*) AS n FROM dd),
      |mm AS (SELECT a.doc_id AS ida, a.source AS sa, a.tc AS ta,
      |              b.doc_id AS idb, b.source AS sb, b.tc AS tb
      |       FROM dd a, nn, (SELECT UNNEST([1, 3, 4, 7]) AS st) s, dd b
      |       WHERE b.doc_id = (a.doc_id + s.st) % nn.n
      |         AND a.source <> b.source),
      |wl AS MATERIALIZED (SELECT
      |    CASE WHEN ta > tb OR (ta = tb AND ida < idb)
      |         THEN sa ELSE sb END AS w,
      |    CASE WHEN ta > tb OR (ta = tb AND ida < idb)
      |         THEN sb ELSE sa END AS l,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM mm GROUP BY 1, 2)""".stripMargin

  private val edgesSql =
    s"""$winsSql,
       |net AS (SELECT x, y, CAST(SUM(c) AS BIGINT) AS net FROM (
       |    SELECT w AS x, l AS y, c FROM wl
       |    UNION ALL SELECT l, w, -c FROM wl)
       |  GROUP BY x, y),
       |e AS MATERIALIZED (SELECT x, y FROM net WHERE net > 0)""".stripMargin

  /** One unrolled Bradley-Terry MM round in e6 fixed point. */
  private def btRound(r: Int): String = {
    val prev = if (r == 1) "p0" else s"p${r - 1}"
    s"""d$r AS (SELECT g.i,
       |    CAST(SUM(g.g * 1000000000000 //
       |      GREATEST(pa.p + pb.p, 1)) AS BIGINT) AS den
       |  FROM g JOIN $prev pa ON pa.i = g.i
       |         JOIN $prev pb ON pb.i = g.j
       |  GROUP BY g.i),
       |u$r AS MATERIALIZED (SELECT wn.i,
       |    wn.wn * 1000000000000 // GREATEST(d$r.den, 1) AS p
       |  FROM wn JOIN d$r ON d$r.i = wn.i),
       |t$r AS (SELECT CAST(SUM(p) AS BIGINT) AS tot,
       |    COUNT(*) AS k FROM u$r),
       |p$r AS MATERIALIZED (SELECT u$r.i,
       |    CAST(u$r.p * t$r.k * 1000000 // GREATEST(t$r.tot, 1)
       |      AS BIGINT) AS p
       |  FROM u$r, t$r)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "p_bradley_terry" ->
      s"""WITH $winsSql,
         |g AS MATERIALIZED (
         |  SELECT i, j, CAST(SUM(c) AS BIGINT) AS g FROM (
         |    SELECT w AS i, l AS j, c FROM wl
         |    UNION ALL SELECT l, w, c FROM wl)
         |  GROUP BY i, j),
         |verts AS MATERIALIZED (SELECT DISTINCT i FROM g),
         |wn AS MATERIALIZED (SELECT v.i,
         |    CAST(COALESCE(SUM(wl.c), 0) AS BIGINT) AS wn
         |  FROM verts v LEFT JOIN wl ON wl.w = v.i GROUP BY v.i),
         |p0 AS MATERIALIZED (
         |  SELECT i, CAST(1000000 AS BIGINT) AS p FROM verts),
         |${(1 to btIters).map(btRound).mkString(",\n")}
         |SELECT p$btIters.i AS source, gt.games, wn.wn AS wins,
         |  p$btIters.p AS bt_e6
         |FROM p$btIters
         |JOIN wn ON wn.i = p$btIters.i
         |JOIN (SELECT i, CAST(SUM(g) AS BIGINT) AS games
         |      FROM g GROUP BY i) gt ON gt.i = p$btIters.i""".stripMargin,

    "p_cohen_kappa" ->
      """WITH d AS (SELECT source,
        |    len(string_split(text, ' ')) >= 55 AS a,
        |    n_chars >= 300 AS b FROM documents),
        |agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n11,
        |    CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n00,
        |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS a1,
        |    CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS b1
        |  FROM d GROUP BY source),
        |kk AS (SELECT source, n, n11, n00,
        |    n * (n11 + n00) - (a1 * b1 + (n - a1) * (n - b1)) AS num,
        |    n * n - (a1 * b1 + (n - a1) * (n - b1)) AS den
        |  FROM agg)
        |SELECT source, n, n11, n00,
        |  CAST((n11 + n00) * 1000000 // n AS BIGINT) AS po_ppm,
        |  CAST(SIGN(num) AS INT) AS kappa_sign,
        |  CAST(CASE WHEN den > 0 THEN ABS(num) * 1000000 // den
        |    ELSE 0 END AS BIGINT) AS kappa_abs_ppm
        |FROM kk""".stripMargin,

    "p_triad_census" ->
      s"""WITH $edgesSql,
         |u AS (SELECT LEAST(x, y) AS a, GREATEST(x, y) AS b FROM e),
         |tri AS (SELECT COUNT(*) AS n_triads
         |  FROM u u1 JOIN u u2 ON u2.a = u1.a AND u1.b < u2.b
         |            JOIN u u3 ON u3.a = u1.b AND u3.b = u2.b),
         |cyc AS (SELECT COUNT(*) AS n_cyclic
         |  FROM e e1 JOIN e e2 ON e2.x = e1.y
         |            JOIN e e3 ON e3.x = e2.y AND e3.y = e1.x
         |  WHERE e1.x < e1.y AND e1.x < e2.y)
         |SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
         |  CAST(n_triads AS BIGINT) AS n_triads,
         |  CAST(n_cyclic AS BIGINT) AS n_cyclic,
         |  CAST(n_triads - n_cyclic AS BIGINT) AS n_transitive,
         |  CAST(n_cyclic * 1000000 // GREATEST(n_triads, 1) AS BIGINT)
         |    AS cyclic_ppm
         |FROM tri, cyc""".stripMargin,

    "p_fleiss_kappa" ->
      """WITH ratings AS (SELECT source,
        |    CASE WHEN len(string_split(text, ' ')) < 40 THEN 0
        |         WHEN len(string_split(text, ' ')) < 70 THEN 1
        |         ELSE 2 END AS r1,
        |    CASE WHEN n_chars < 250 THEN 0
        |         WHEN n_chars < 450 THEN 1 ELSE 2 END AS r2,
        |    CASE WHEN len(list_distinct(string_split(text, ' '))) * 10
        |              < len(string_split(text, ' ')) * 7 THEN 0
        |         WHEN len(list_distinct(string_split(text, ' '))) * 10
        |              < len(string_split(text, ' ')) * 9 THEN 1
        |         ELSE 2 END AS r3
        |  FROM documents),
        |nij AS (SELECT source,
        |    (CASE WHEN r1=0 THEN 1 ELSE 0 END
        |     + CASE WHEN r2=0 THEN 1 ELSE 0 END
        |     + CASE WHEN r3=0 THEN 1 ELSE 0 END) AS n0,
        |    (CASE WHEN r1=1 THEN 1 ELSE 0 END
        |     + CASE WHEN r2=1 THEN 1 ELSE 0 END
        |     + CASE WHEN r3=1 THEN 1 ELSE 0 END) AS n1,
        |    (CASE WHEN r1=2 THEN 1 ELSE 0 END
        |     + CASE WHEN r2=2 THEN 1 ELSE 0 END
        |     + CASE WHEN r3=2 THEN 1 ELSE 0 END) AS n2
        |  FROM ratings),
        |agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_items,
        |    CAST(SUM(n0*n0 + n1*n1 + n2*n2) AS BIGINT) AS sq,
        |    CAST(SUM(n0) AS BIGINT) AS c0,
        |    CAST(SUM(n1) AS BIGINT) AS c1,
        |    CAST(SUM(n2) AS BIGINT) AS c2
        |  FROM nij GROUP BY source),
        |kk AS (SELECT source, n_items, c0, c1, c2,
        |    sq - n_items * 3 AS s_num,
        |    (sq - n_items * 3) * n_items * 3
        |      - 2 * (c0*c0 + c1*c1 + c2*c2) AS num,
        |    2 * (n_items * 3 * n_items * 3
        |      - (c0*c0 + c1*c1 + c2*c2)) AS den
        |  FROM agg)
        |SELECT source, n_items, c0, c1, c2,
        |  CAST(s_num * 1000000 // (n_items * 6) AS BIGINT) AS pbar_ppm,
        |  CAST(SIGN(num) AS INT) AS kappa_sign,
        |  CAST(CASE WHEN den > 0 THEN ABS(num) * 1000000 // den
        |    ELSE 0 END AS BIGINT) AS kappa_abs_ppm
        |FROM kk""".stripMargin,

    "p_copeland_borda" ->
      s"""WITH $edgesSql,
         |verts AS (SELECT DISTINCT s AS source FROM (
         |    SELECT w AS s FROM wl UNION ALL SELECT l FROM wl)),
         |outd AS (SELECT x AS source, CAST(COUNT(*) AS BIGINT) AS mw
         |  FROM e GROUP BY x),
         |ind AS (SELECT y AS source, CAST(COUNT(*) AS BIGINT) AS ml
         |  FROM e GROUP BY y),
         |borda AS (SELECT w AS source, CAST(SUM(c) AS BIGINT) AS wins
         |  FROM wl GROUP BY w),
         |g AS (SELECT v.source,
         |    COALESCE(outd.mw, 0) AS maj_wins,
         |    COALESCE(ind.ml, 0) AS maj_losses,
         |    COALESCE(borda.wins, 0) AS borda,
         |    COALESCE(outd.mw, 0) - COALESCE(ind.ml, 0) AS copeland_net
         |  FROM verts v
         |  LEFT JOIN outd USING (source)
         |  LEFT JOIN ind USING (source)
         |  LEFT JOIN borda USING (source))
         |SELECT source, maj_wins, maj_losses, borda, copeland_net,
         |  CAST(DENSE_RANK() OVER (ORDER BY copeland_net DESC,
         |    source ASC) AS INT) AS copeland_rank,
         |  CAST(DENSE_RANK() OVER (ORDER BY borda DESC, source ASC)
         |    AS INT) AS borda_rank
         |FROM g""".stripMargin,

    "p_js_divergence" ->
      """WITH d AS (SELECT source,
        |    LEAST(len(string_split(text, ' ')) // 20, 9) AS bucket
        |  FROM documents),
        |per AS (SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS k
        |  FROM d GROUP BY source, bucket),
        |ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
        |  FROM d GROUP BY source),
        |qb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS kb
        |  FROM d GROUP BY bucket),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM d),
        |grid AS (SELECT ns.source, qb.bucket, ns.ns, qb.kb, nt.nn,
        |    CAST(COALESCE(per.k, 0) AS BIGINT) AS k
        |  FROM ns CROSS JOIN qb CROSS JOIN nt
        |  LEFT JOIN per ON per.source = ns.source
        |    AND per.bucket = qb.bucket),
        |terms AS (SELECT source,
        |    CASE WHEN k > 0 THEN CAST(
        |      CAST(ROUND(CAST(k AS DOUBLE) / CAST(ns AS DOUBLE) *
        |        ROUND(LN(CAST(2 * k * nn AS DOUBLE) /
        |          CAST(k * nn + kb * ns AS DOUBLE)), 9), 12)
        |        AS DECIMAL(20,12)) * 1000000000000 AS BIGINT)
        |      ELSE 0 END AS tp,
        |    CAST(
        |      CAST(ROUND(CAST(kb AS DOUBLE) / CAST(nn AS DOUBLE) *
        |        ROUND(LN(CAST(2 * kb * ns AS DOUBLE) /
        |          CAST(k * nn + kb * ns AS DOUBLE)), 9), 12)
        |        AS DECIMAL(20,12)) * 1000000000000 AS BIGINT) AS tq
        |  FROM grid)
        |SELECT source, CAST(SUM(tp) AS BIGINT) AS kl_p_e12,
        |  CAST(SUM(tq) AS BIGINT) AS kl_q_e12,
        |  CAST(SUM(tp) + SUM(tq) AS BIGINT) AS js_x2_e12
        |FROM terms GROUP BY source""".stripMargin
  )
}

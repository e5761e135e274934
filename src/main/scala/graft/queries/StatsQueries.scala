package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Statistical testing + distribution-analysis operators: the checks a
  * corpus owner runs BEFORE trusting that two snapshots, two splits, or
  * two variants are comparable — drift (PSI), distribution equality
  * (KS), independence (chi-square), fabrication (Benford), experiment
  * significance (two-proportion z), cross-source score alignment
  * (quantile normalization), and retention survival (Kaplan-Meier /
  * Nelson-Aalen). The reference's report surface (`app/main.py:143`
  * reasons, counts) generalized from file counts to distributions.
  *
  * Comparator discipline (house rules): every ratio that can be exact
  * is an exact integer ppm (`x * 1000000 div n` on non-negative
  * operands, where Spark `div` and DuckDB `//` agree); every libm call
  * (ln) is ROUND-ed to fixed decimals BEFORE entering an aggregation;
  * every aggregated double runs as an exact DECIMAL sum (partition- and
  * order-invariant) and is cast back once; every closing formula is one
  * identical IEEE tree on both engines.
  *
  * Scale shapes: each query is groupBy-aggregations over corpus-sized
  * scans plus joins against *model-sized* frames (bucket grids, rank
  * means, risk tables — hundreds of rows) that are explicitly
  * broadcast. The one ordered structure (the KS ECDF) is built with a
  * range-partitioned two-pass prefix sum — per-partition totals (one
  * tiny agg) feed exclusive offsets joined back by partition id, so no
  * single-partition window ever sees corpus-sized data.
  */
object StatsQueries {

  /** Events split into a reference window (first half of the fixture
    * month) and a current window — the two snapshots a drift monitor
    * compares. */
  private val DriftCut = "2024-01-16 00:00:00"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Population Stability Index per event_type between the
    //      reference and current halves of the events table. Ten
    //      fixed-width buckets from the REFERENCE min/max (current
    //      values clamp into the edge buckets — mass migrating outside
    //      the trained range is exactly what PSI must see), +1 Laplace
    //      smoothing so empty buckets contribute finite terms. Shapes:
    //      one corpus scan feeds the per-type min/max agg and the
    //      bucket counts; the 10-bucket-per-type grid (model-sized) is
    //      densified by a spine cross join and every join against it is
    //      broadcast. ----
    "q_psi_drift" -> ((s, dir) => {
      val cut = lit(DriftCut).cast("timestamp")
      val e = t(s, dir, "events")
        .select(col("event_type").as("et"), col("value").as("v"),
          (col("ts") < cut).as("is_ref"))
        .localCheckpoint(false) // feeds ref-stats, cur-totals, buckets
      val st = e.filter(col("is_ref")).groupBy("et")
        .agg(min("v").as("lo"), max("v").as("hi"),
          count(lit(1)).as("n_ref"))
        .localCheckpoint(false) // feeds bucketing join AND the spine
      val cn = e.filter(!col("is_ref")).groupBy("et")
        .agg(count(lit(1)).as("n_cur"))
      val b = e.join(broadcast(st.select("et", "lo", "hi")), "et")
        .withColumn("bucket", least(lit(9L), greatest(lit(0L),
          floor((col("v") - col("lo")) /
            ((col("hi") - col("lo")) / lit(10.0))))))
        .groupBy("et", "bucket")
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("c_ref"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).as("c_cur"))
      val spine = st.select("et")
        .crossJoin(s.range(0, 10).toDF("bucket"))
      val grid = spine.join(b, Seq("et", "bucket"), "left")
        .na.fill(0L, Seq("c_ref", "c_cur"))
      grid.join(broadcast(st.select("et", "n_ref")), "et")
        .join(broadcast(cn), "et")
        .withColumn("pr", (col("c_ref") + lit(1)).cast("double") /
          (col("n_ref") + lit(10)).cast("double"))
        .withColumn("pc", (col("c_cur") + lit(1)).cast("double") /
          (col("n_cur") + lit(10)).cast("double"))
        .withColumn("term", round((col("pc") - col("pr")) *
          round(log(col("pc") / col("pr")), 9), 12))
        .groupBy("et")
        .agg(max("n_ref").as("n_ref"), max("n_cur").as("n_cur"),
          round(sum(col("term").cast("decimal(38,12)")).cast("double"), 6)
            .as("psi"))
        .select(col("et").as("event_type"), col("n_ref"), col("n_cur"),
          col("psi"))
    }),

    // ---- chi-square independence test: is document language
    //      independent of source? One corpus-sized groupBy to the
    //      r x c contingency grid; marginals, totals and dims are all
    //      aggregations OVER THE GRID (model-sized), broadcast back.
    //      Expected counts and the closing z/V formulas are one
    //      identical IEEE tree; the chi2 sum itself is an exact
    //      DECIMAL fold of round-9 terms. ----
    "q_chi2_independence" -> ((s, dir) => {
      val g = t(s, dir, "documents")
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
        .localCheckpoint(false) // grid feeds marginals + terms
      val rm = g.groupBy("lang").agg(sum("o").as("rn"))
      val cm = g.groupBy("source").agg(sum("o").as("cn"))
      val dims = rm.agg(count(lit(1)).as("r"))
        .crossJoin(cm.agg(count(lit(1)).as("c")))
        .crossJoin(g.agg(sum("o").as("n")))
      g.join(broadcast(rm), "lang").join(broadcast(cm), "source")
        .crossJoin(broadcast(dims))
        .withColumn("e", col("rn").cast("double") *
          col("cn").cast("double") / col("n").cast("double"))
        .withColumn("term", round(
          (col("o").cast("double") - col("e")) *
            (col("o").cast("double") - col("e")) / col("e"), 9))
        .groupBy()
        .agg(max("n").as("n"), max("r").as("r"), max("c").as("c"),
          ((max("r") - 1) * (max("c") - 1)).as("df"),
          sum(col("term").cast("decimal(38,9)")).cast("double")
            .as("chi2_raw"),
          least(max("r"), max("c")).as("mindim"))
        .select(col("n"), col("r"), col("c"), col("df"),
          round(col("chi2_raw"), 6).as("chi2"),
          round(sqrt(col("chi2_raw") /
            (col("n").cast("double") * (col("mindim") - 1)
              .cast("double"))), 6).as("cramers_v"))
    }),

    // ---- Benford first-digit audit over order totals: the
    //      fabricated-data screen (synthetic or truncated monetary
    //      columns flunk it). First digit comes from integer cents
    //      (floor(price*100) -> BIGINT -> string head) — no
    //      double-to-decimal rounding fork can move a digit. Expected
    //      Benford mass ln(1+1/d)/ln(10) is rounded to whole ppm at
    //      the literal level. Shapes: one scan, one 9-row groupBy,
    //      dense digit spine, broadcast total. ----
    "q_benford" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(substring(floor(col("o_totalprice") * lit(100.0))
          .cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val spine = s.range(1, 10).toDF("digit")
        .select(col("digit").cast("int").as("digit"))
      val tot = o.agg(sum("n").as("tot"))
      spine.join(o, Seq("digit"), "left").na.fill(0L, Seq("n"))
        .crossJoin(broadcast(tot))
        .withColumn("obs_ppm", expr("n * 1000000 div tot"))
        .withColumn("exp_ppm",
          round(log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
            log(lit(10.0)) * lit(1000000.0), 0).cast("long"))
        .select(col("digit"), col("n"), col("obs_ppm"), col("exp_ppm"),
          abs(col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
    }),

    // ---- two-proportion z-test over a deterministic A/B split
    //      (variant = user_id parity): did the rate of HIGH-VALUE
    //      purchases (value > 150 — "any purchase" is universal in the
    //      fixture, a degenerate pooled p = 1) differ by variant?
    //      Exposures and conversions are exact distinct
    //      counts; the pooled z closes in one IEEE tree. Shapes: one
    //      scan -> per-variant distinct agg (2 groups) -> single-row
    //      pivot. At 100 TB countDistinct becomes a 2-phase exact
    //      distinct (the e_distinct_twophase pattern) — the closing
    //      algebra is unchanged. ----
    "q_ab_ztest" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select((col("user_id") % 2).as("variant"), col("user_id"),
          col("event_type"), col("value"))
      val agg = e.groupBy("variant").agg(
        countDistinct("user_id").as("n"),
        countDistinct(when(col("event_type") === "purchase" &&
          col("value") > 150.0, col("user_id"))).as("conv"))
      val w = agg.groupBy().agg(
        max(when(col("variant") === 0, col("n"))).as("n0"),
        max(when(col("variant") === 1, col("n"))).as("n1"),
        max(when(col("variant") === 0, col("conv"))).as("conv0"),
        max(when(col("variant") === 1, col("conv"))).as("conv1"))
      w.withColumn("p0", col("conv0").cast("double") /
          col("n0").cast("double"))
        .withColumn("p1", col("conv1").cast("double") /
          col("n1").cast("double"))
        .withColumn("pp", (col("conv0") + col("conv1")).cast("double") /
          (col("n0") + col("n1")).cast("double"))
        .withColumn("z", (col("p0") - col("p1")) /
          sqrt(col("pp") * (lit(1.0) - col("pp")) *
            (lit(1.0) / col("n0").cast("double") +
              lit(1.0) / col("n1").cast("double"))))
        .select(col("n0"), col("n1"), col("conv0"), col("conv1"),
          expr("conv0 * 1000000 div n0").as("p0_ppm"),
          expr("conv1 * 1000000 div n1").as("p1_ppm"),
          round(col("z"), 6).as("z"),
          (abs(col("z")) > lit(1.959964)).as("significant_05"))
    }),

    // ---- two-sample Kolmogorov-Smirnov test: are F-status and
    //      O-status order totals drawn from the same distribution?
    //      The ECDF difference needs a GLOBAL prefix sum — built here
    //      as the scale-correct two-pass: per-value histogram ->
    //      range-partition by value -> per-partition totals (one tiny
    //      agg, #partitions rows) -> exclusive offsets joined back by
    //      partition id -> per-partition cumulative window. No
    //      single-partition window ever sees the corpus; the same
    //      shape computes any distributed running total. D and both
    //      ECDFs are exact e6 fixed point; only the critical value
    //      touches libm (one sqrt, closed identically). ----
    "q_ks_test" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderstatus").isin("F", "O"))
        .select(col("o_totalprice").as("x"),
          (col("o_orderstatus") === "F").as("is_a"))
        .localCheckpoint(false) // feeds histogram + totals
      val hist = o.groupBy("x").agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
      val tot = o.groupBy().agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("nb"))
      graft.operators.Ranks.prefixSums(hist, "x", Seq("ca", "cb"))
        .crossJoin(broadcast(tot))
        .withColumn("diff_e6", abs(expr("cum_ca * 1000000 div na") -
          expr("cum_cb * 1000000 div nb")))
        .groupBy()
        .agg(max("na").as("n_a"), max("nb").as("n_b"),
          max("diff_e6").as("d_e6"))
        .withColumn("crit_e6", round(lit(1.358) *
          sqrt((col("n_a") + col("n_b")).cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double"))) *
          lit(1000000.0), 0).cast("long"))
        .select(col("n_a"), col("n_b"), col("d_e6"), col("crit_e6"),
          (col("d_e6") > col("crit_e6")).as("reject_05"))
    }),

    // ---- Mann-Whitney U (Wilcoxon rank-sum) on the same two order
    //      populations as the KS test — the nonparametric "is one
    //      distribution stochastically larger" test that stays valid
    //      when a t-test's normality assumption doesn't. Average ranks
    //      live in DOUBLED fixed point (a tied group's mean rank is a
    //      multiple of 1/2), so R_A, U and the tie-correction term are
    //      all EXACT integers from `Ranks.prefixSums`; only the
    //      closing normal approximation touches doubles. ----
    "q_mannwhitney_u" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderstatus").isin("F", "O"))
        .select(col("o_totalprice").as("x"),
          (col("o_orderstatus") === "F").as("is_a"))
        .localCheckpoint(false) // histogram + totals
      val hist = o.groupBy("x").agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
        .withColumn("cnt", col("ca") + col("cb"))
      val ranked = graft.operators.Ranks.prefixSums(hist, "x", Seq("cnt"))
        .withColumn("rank_x2",
          lit(2L) * col("pre_cnt") + col("cnt") + 1L)
      val tot = o.groupBy().agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("nb"))
      ranked.groupBy()
        .agg(sum(col("ca") * col("rank_x2")).as("ra_x2"),
          sum(col("cnt") * col("cnt") * col("cnt") - col("cnt"))
            .as("tie_term"))
        .crossJoin(broadcast(tot))
        .withColumn("u_a_x2", col("ra_x2") - col("na") * (col("na") + 1L))
        .withColumn("nn", col("na") + col("nb"))
        .withColumn("sigma", sqrt(
          col("na").cast("double") * col("nb").cast("double") / lit(12.0) *
            ((col("nn") + 1L).cast("double") -
              col("tie_term").cast("double") /
                (col("nn").cast("double") * (col("nn") - 1L)
                  .cast("double")))))
        .withColumn("z", ((col("u_a_x2") -
          col("na") * col("nb")).cast("double") / lit(2.0)) / col("sigma"))
        .select(col("na").as("n_a"), col("nb").as("n_b"),
          col("u_a_x2"), col("tie_term"),
          round(col("z"), 6).as("z"),
          (abs(col("z")) > lit(1.959964)).as("reject_05"))
    }),

    // ---- Spearman rank correlation between line-item quantity and
    //      extended price: Pearson over average ranks, tie-aware (the
    //      50 distinct quantities make HALF the pairs ties — the
    //      no-ties 6Σd² shortcut would be plain wrong here). Ranks
    //      come exact-x2 from `Ranks.avgRanks`; centering uses the
    //      exact integer mean rank (n+1 in x2 units), so all three
    //      moment sums are exact integers (|c| <= 2n keeps them in
    //      range through n ~ 10^6 per the DECIMAL(38,0) fold; beyond
    //      that the same pipeline runs on e6-normalized ranks). One
    //      corpus scan, two model-or-histogram-sized rank joins, one
    //      closing IEEE tree. ----
    "q_spearman" -> ((s, dir) => {
      // measured r16: Par.spread here is a net LOSS (2.56 → 3.07 s) —
      // the rank fits are sort/agg-bound, not map-bound, so the extra
      // exchange buys nothing the shuffle doesn't already provide
      val l = t(s, dir, "lineitem")
        .select(col("l_quantity").as("x"),
          col("l_extendedprice").as("y"))
        .localCheckpoint(false) // rank fits + the joined scan
      val rx = graft.operators.Ranks.avgRanks(l.select("x"), "x")
        .select(col("x"), col("rank_x2").as("rx2"))
      val ry = graft.operators.Ranks.avgRanks(l.select("y"), "y")
        .select(col("y"), col("rank_x2").as("ry2"))
      val n1 = l.groupBy().agg((count(lit(1)) + 1L).as("np1"))
      l.join(broadcast(rx), "x").join(ry, "y")
        .crossJoin(broadcast(n1))
        .withColumn("cx", col("rx2") - col("np1"))
        .withColumn("cy", col("ry2") - col("np1"))
        .groupBy()
        .agg((max("np1") - 1L).as("n"),
          sum((col("cx") * col("cy")).cast("decimal(38,0)"))
            .cast("double").as("sxy"),
          sum((col("cx") * col("cx")).cast("decimal(38,0)"))
            .cast("double").as("sxx"),
          sum((col("cy") * col("cy")).cast("decimal(38,0)"))
            .cast("double").as("syy"))
        .select(col("n"),
          round(col("sxy") / sqrt(col("sxx") * col("syy")), 6)
            .as("rho"))
    }),

    // ---- Kendall tau-b between two BOUNDED-cardinality columns
    //      (quantity 1-50 × linenumber 1-7): rank correlation that,
    //      unlike Spearman, never materializes per-row ranks — the
    //      corpus collapses to a ≤350-cell contingency grid in ONE
    //      map-combinable groupBy, and concordant/discordant pair
    //      mass is an exact product-sum over the grid's self-join
    //      (broadcast-scale, 350² cells — never the O(n²) row
    //      pairing). Cell-count products run as DECIMAL(38,0) so C/D
    //      stay exact past 2^63 intermediate; the closing tau is one
    //      shared IEEE tree (sqrt per factor — the n0·tx product
    //      would overflow doubles' exact-integer range first).
    //      tau_e6 sign travels in the numerator; ROUND half-away
    //      agrees across engines on identical doubles. ----
    "q_kendall_tau" -> ((s, dir) => {
      val g = t(s, dir, "lineitem")
        .select(col("l_quantity").cast("long").as("x"),
          col("l_linenumber").cast("long").as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("k"))
        .localCheckpoint(false) // grid feeds self-join + 3 marginals
      val prod = (col("a.k").cast("decimal(19,0)") *
        col("b.k").cast("decimal(19,0)"))
      val cd = g.as("a").join(broadcast(g.as("b")),
          col("a.x") < col("b.x"))
        .agg(
          sum(when(col("a.y") < col("b.y"), prod)
            .otherwise(lit(0).cast("decimal(19,0)")))
            .cast("long").as("conc"),
          sum(when(col("a.y") > col("b.y"), prod)
            .otherwise(lit(0).cast("decimal(19,0)")))
            .cast("long").as("disc"))
      val tx = g.groupBy("x").agg(sum("k").as("nx"))
        .agg(sum(expr("nx * (nx - 1) div 2")).as("tx"))
      val ty = g.groupBy("y").agg(sum("k").as("ny"))
        .agg(sum(expr("ny * (ny - 1) div 2")).as("ty"))
      val n = g.agg(sum("k").as("n"))
      cd.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
        .crossJoin(broadcast(n))
        .withColumn("n0", expr("n * (n - 1) div 2"))
        .select(col("n"), col("n0"), col("tx"), col("ty"),
          col("conc"), col("disc"),
          round((col("conc") - col("disc")).cast("double") * lit(1e6) /
            (sqrt((col("n0") - col("tx")).cast("double")) *
              sqrt((col("n0") - col("ty")).cast("double"))), 0)
            .cast("long").as("tau_e6"))
    }),

    // ---- deterministic 5-fold CV assignment + stability audit:
    //      hash-stable fold membership (md5-keyed, so folds survive
    //      corpus growth), per-fold size and mean doc length, and
    //      the cross-fold spread — the check that fold means agree
    //      before anyone attributes a metric delta to a model rather
    //      than a lucky fold. All exact integers (means in e6); one
    //      map-combinable agg + a broadcast 5-row fold. ----
    "q_cv_kfold" -> ((s, dir) => {
      val per = t(s, dir, "documents")
        .select((conv(substring(md5(concat(lit("cv:"),
          col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long")
          % 5L).as("fold"), col("n_chars"))
        .groupBy("fold").agg(count(lit(1)).as("n"),
          sum("n_chars").as("sum_chars"))
        .withColumn("mean_e6", expr("sum_chars * 1000000L div n"))
      val sp = per.agg(
        (max("mean_e6") - min("mean_e6")).as("spread_e6"),
        (max("n") - min("n")).as("max_imbalance"))
      per.crossJoin(broadcast(sp))
        .select(col("fold"), col("n"), col("sum_chars"), col("mean_e6"),
          col("spread_e6"), col("max_imbalance"))
    }),

    // ---- exact per-source length percentiles (p10/p50/p90, "lower"
    //      order statistics) from a cumsum over the (source, value)
    //      grid — never a per-source row sort: the grid is bounded by
    //      the value domain, so a skewed megasource costs the same
    //      window as a small one (the q_conformal_coverage shape,
    //      keyed). Rank thresholds use exact ceil div; selection is
    //      three conditional MIN aggregates. ----
    "q_group_percentiles" -> ((s, dir) => {
      val g = t(s, dir, "documents")
        .select(col("source"),
          graft.functions.Text.tokenCount(col("text")).cast("long")
            .as("tc"))
        .groupBy("source", "tc").agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy("source").orderBy("tc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("source")
      g.withColumn("cum", sum("c").over(wCum))
        .withColumn("n", sum("c").over(wAll))
        .groupBy("source").agg(
          max("n").as("n"),
          min(when(col("cum") >= expr("(n + 9) div 10"), col("tc")))
            .as("p10"),
          min(when(col("cum") >= expr("(n + 1) div 2"), col("tc")))
            .as("p50"),
          min(when(col("cum") >= expr("(9 * n + 9) div 10"), col("tc")))
            .as("p90"))
    }),

    // ---- two-proportion power analysis per event type: the sample
    //      size each arm needs to detect a +2 pp absolute lift at
    //      α = 0.05 / power 80% (z literals 1.959964, 0.841621 —
    //      fixed in both engines), vs the users actually available —
    //      the experiment-design readout run BEFORE q_ab_ztest ever
    //      fires. Baseline conversion is an exact integer ratio cast
    //      once to double; the closing n = (z_a·√(2p̄q̄) +
    //      z_b·√(p₁q₁+p₂q₂))²/δ² is one shared IEEE tree (sqrt
    //      exact); CEIL of identical doubles agrees. One
    //      map-combinable agg. ----
    "e_power_analysis" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy("event_type").agg(count(lit(1)).as("n"),
          sum(when(col("value") >= 10.0, 1L).otherwise(0L)).as("conv"))
        .withColumn("p1",
          col("conv").cast("double") / col("n").cast("double"))
        // clamp: a ≥98% baseline would push p2 past 1 and the sqrt
        // argument negative (NaN here, a hard error in the oracle)
        .withColumn("p2", least(col("p1") + lit(0.02), lit(1.0)))
        .withColumn("pbar", (col("p1") + col("p2")) / lit(2.0))
        .withColumn("n_req",
          ceil(
            ((lit(1.959964) * sqrt(lit(2.0) * col("pbar") *
              (lit(1.0) - col("pbar"))) +
              lit(0.841621) * sqrt(col("p1") * (lit(1.0) - col("p1")) +
                col("p2") * (lit(1.0) - col("p2")))) *
              (lit(1.959964) * sqrt(lit(2.0) * col("pbar") *
                (lit(1.0) - col("pbar"))) +
                lit(0.841621) * sqrt(col("p1") * (lit(1.0) - col("p1")) +
                  col("p2") * (lit(1.0) - col("p2"))))) /
              (lit(0.02) * lit(0.02))).cast("long"))
        .select(col("event_type"), col("n"), col("conv"),
          expr("conv * 1000000L div n").as("p_ppm"), col("n_req"),
          (expr("n div 2") >= col("n_req")).as("powered"))
    }),

    // ---- leave-one-source-out influence on the corpus mean doc
    //      length: for each source, how far the global mean moves if
    //      the source is dropped — the cheapest data-valuation
    //      readout (exact, linear in the totals; no refits). Exact
    //      rational with the common denominator N·(N−n_h): delta =
    //      (S·n_h − N·s_h)/(N(N−n_h)); sign travels separately
    //      (BIGINT-safe while S·N < 2⁶³ — per-shard audit past
    //      ~10⁹ docs·tokens, DECIMAL noted). One corpus agg + one
    //      per-source agg, both map-combinable. ----
    "q_loo_influence" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("source"),
          graft.functions.Text.tokenCount(col("text")).cast("long")
            .as("tc"))
        .localCheckpoint(false) // totals + per-source
      val tot = d.agg(count(lit(1)).as("nn"), sum("tc").as("ss"))
      d.groupBy("source").agg(count(lit(1)).as("nh"),
          sum("tc").as("sh"))
        .crossJoin(broadcast(tot))
        .withColumn("num", expr("ss * nh - nn * sh"))
        .select(col("source"), col("nh"), col("sh"),
          expr("(ss - sh) * 1000000L div (nn - nh)").as("loo_mean_e6"),
          signum(col("num")).cast("int").as("delta_sign"),
          expr("abs(num) * 1000000L div (nn * (nn - nh))")
            .as("delta_abs_e6"))
    }),

    // ---- Neyman allocation for stratified sampling: given a total
    //      budget of 1000 draws, allocate n_h ∝ N_h·σ_h per source —
    //      the design that minimizes the stratified-mean variance,
    //      computed BEFORE q_stratified_sample draws anything.
    //      Per-stratum moments are exact DECIMAL sums of doc length
    //      (map-combinable); σ_h = sqrt of the exact population
    //      variance (N·Σx² − (Σx)²)/N² closes in one shared IEEE
    //      tree (sqrt exact, ROUND half-away agrees on identical
    //      doubles); the allocation shares are model-sized. ----
    "q_neyman_allocation" -> ((s, dir) => {
      val budget = 1000L
      val strata = t(s, dir, "documents")
        .select(col("source"), col("n_chars"))
        .groupBy("source").agg(count(lit(1)).as("nh"),
          sum("n_chars").as("sx"),
          sum(col("n_chars") * col("n_chars")).as("sxx"))
        // N_h·σ_h = sqrt(N·Σx² − (Σx)²), rounded to 6 dp into exact
        // DECIMAL so the cross-stratum total is order-invariant
        .withColumn("nsig",
          round(sqrt((col("nh") * col("sxx") - col("sx") * col("sx"))
            .cast("double")), 6).cast("decimal(28,6)"))
      val tot = strata.agg(sum("nsig").as("tot_nsig"))
      strata.crossJoin(broadcast(tot))
        .select(col("source"), col("nh"),
          col("nsig").cast("double").as("nh_sigma"),
          expr(s"cast(round(cast(nsig as double) * $budget " +
            "/ cast(tot_nsig as double), 0) as bigint)").as("alloc"),
          expr("cast(round(cast(nsig as double) * 1000000 " +
            "/ cast(tot_nsig as double), 0) as bigint)").as("share_ppm"))
    }),

    // ---- unbiased pass@k (Chen et al. 2021's combinatorial
    //      estimator): tasks = users, trials = their events, success
    //      = value ≥ 10; pass@k per task = 1 − C(n−c,k)/C(n,k),
    //      evaluated as the left-assoc product Π (n−c−i)/(n−i) (hits
    //      an exact 0 factor when failures < k — no branch needed).
    //      The eval readout every sampling-based benchmark reports,
    //      over tasks with n ≥ k only. Per-task work is one
    //      map-combinable agg + a k≤10-element HOF fold; per-task
    //      pass rounds to e9 BEFORE the mean so the cross-task
    //      average is an exact integer (order-invariant). ----
    "q_pass_at_k" -> ((s, dir) => {
      val tasks = t(s, dir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("n"),
          sum(when(col("value") >= 10.0, 1L).otherwise(0L)).as("c"))
      tasks
        .withColumn("k", explode(array(lit(1L), lit(5L), lit(10L))))
        .filter(col("n") >= col("k"))
        .withColumn("fail_prob",
          aggregate(sequence(lit(0L), col("k") - 1), lit(1.0),
            (acc, i) => acc * ((col("n") - col("c") - i).cast("double") /
              (col("n") - i).cast("double"))))
        .withColumn("pass_e9",
          expr("cast(round((1.0 - fail_prob) * 1000000000, 0) as bigint)"))
        .groupBy("k").agg(count(lit(1)).as("n_tasks"),
          sum("pass_e9").as("sp"))
        .select(col("k"), col("n_tasks"),
          expr("sp div (n_tasks * 1000)").as("mean_pass_e6"))
    }),

    // ---- 1-D Wasserstein (earth-mover) distance per source vs the
    //      corpus over doc-length buckets: W1 = Σ_b |P(≤b) − Q(≤b)|
    //      in bucket units — the drift number that, unlike
    //      p_js_divergence, scales with HOW FAR the mass moved, not
    //      just that it moved. Exact rational throughout: cumulative
    //      counts share the n·N denominator, so the per-bucket term
    //      is |cumk·N − cumK·n| in BIGINT and ONE floor division
    //      closes the sum (safe to ~10⁶ docs; past that the audit
    //      promotes the products to DECIMAL — noted). Corpus-scale
    //      work is one bucketed groupBy; the cumsum windows run over
    //      the sources × ≤10 bucket grid. ----
    "q_wasserstein_1d" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("source"),
          graft.functions.Text.tokenCount(col("text")).cast("long")
            .as("tc"))
        .select(col("source"), expr("least(tc div 20, 9L)").as("bucket"))
        .localCheckpoint(false) // feeds three independent aggs
      val per = d.groupBy("source", "bucket").agg(count(lit(1)).as("k"))
      val ns = d.groupBy("source").agg(count(lit(1)).as("n"))
      val qb = d.groupBy("bucket").agg(count(lit(1)).as("kb"))
      val nTot = d.agg(count(lit(1)).as("nn"))
      val wCum = Window.partitionBy("source").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ns.crossJoin(broadcast(qb)).crossJoin(broadcast(nTot))
        .join(per, Seq("source", "bucket"), "left")
        .withColumn("k", coalesce(col("k"), lit(0L)))
        .withColumn("cumk", sum("k").over(wCum))
        .withColumn("cumkb", sum("kb").over(wCum))
        .groupBy("source").agg(
          max("n").as("n"),
          sum(abs(col("cumk") * col("nn") - col("cumkb") * col("n")))
            .as("num"),
          max("nn").as("nn"))
        .select(col("source"), col("n"),
          expr("num * 1000000L div (n * nn)").as("w1_e6"))
    }),

    // ---- split-conformal coverage audit: calibrate the |n_chars −
    //      6·tokens| nonconformity score on even doc_ids at α = 0.1
    //      (threshold = the ⌈0.9(n+1)⌉-th order statistic), then
    //      measure empirical coverage on the held-out odd half — the
    //      distribution-free guarantee check (coverage ≥ 90% in
    //      expectation) run before trusting any per-doc prediction
    //      band. The order statistic comes from a cumsum over the
    //      value-bounded score grid (never a corpus sort); coverage
    //      is one map-combinable agg. All integers. ----
    "q_conformal_coverage" -> ((s, dir) => {
      val sc = t(s, dir, "documents")
        .select(col("doc_id"),
          abs(col("n_chars") - lit(6L) *
            graft.functions.Text.tokenCount(col("text")).cast("long"))
            .as("score"))
        .localCheckpoint(false) // calibration + eval halves
      val cal = sc.filter(col("doc_id") % 2 === 0)
      val nc = cal.agg(count(lit(1)).as("n_cal"),
        expr("(9 * count(1) + 18) div 10").as("k_rank"))
      // unpartitioned window: BOUNDED — runs over the groupBy("score")
      // grid (one row per distinct |n_chars − 6·tokens| value, a
      // value-domain bound), never corpus rows
      val wCum = Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val thr = cal.groupBy("score").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(wCum))
        .crossJoin(broadcast(nc))
        .filter(col("cum") >= col("k_rank"))
        .agg(min("score").as("threshold"))
      sc.filter(col("doc_id") % 2 === 1)
        .crossJoin(broadcast(thr))
        .agg(count(lit(1)).as("n_eval"),
          sum(when(col("score") <= col("threshold"), 1L).otherwise(0L))
            .as("n_cov"),
          max("threshold").as("threshold"))
        .crossJoin(broadcast(nc))
        .select(col("n_cal"), col("k_rank"), col("threshold"),
          col("n_eval"), col("n_cov"),
          expr("n_cov * 1000000L div n_eval").as("cov_ppm"))
    }),

    // ---- Kaplan-Meier / Nelson-Aalen retention survival over user
    //      lifetimes: duration = whole hours between a user's first
    //      and last event; a user whose last event predates the final
    //      72 h of the fixture window "churned" (death), later ones
    //      are right-censored (still active). The corpus-sized work is
    //      ONE per-user agg; the risk table after groupBy(duration) is
    //      model-sized (<= fixture hours), so its two ordered
    //      cumulations (reverse cumsum for the at-risk count, forward
    //      cumsum for the hazard) are windows over hundreds of rows.
    //      Nelson-Aalen cumulative hazard is EXACT integer ppm; the KM
    //      product is carried in log space (round-9 ln terms, exact
    //      DECIMAL cumsum — no exp, no product aggregate) and nulled
    //      once survival hits exact zero. ----
    "e_kaplan_meier" -> ((s, dir) => {
      val cutoff = lit("2024-01-28 00:00:00").cast("timestamp")
      val u = t(s, dir, "events").groupBy("user_id")
        .agg(min("ts").as("first_ts"), max("ts").as("last_ts"))
        .select(expr("(unix_micros(last_ts) - unix_micros(first_ts))" +
          " div 3600000000").as("t_h"),
          when(col("last_ts") < cutoff, 1L).otherwise(0L).as("death"))
      val rt = u.groupBy("t_h").agg(sum("death").as("d"),
        (count(lit(1)) - sum("death")).as("c"))
      // unpartitioned windows: BOUNDED — the life table has one row
      // per whole-hour lifetime (wall-clock-span bound), never users
      val wRev = Window.orderBy(col("t_h").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wFwd = Window.orderBy(col("t_h").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rt.withColumn("n_risk", sum(col("d") + col("c")).over(wRev))
        .withColumn("haz_ppm", expr("d * 1000000 div n_risk"))
        .withColumn("na_ppm", sum("haz_ppm").over(wFwd))
        .withColumn("dead_end",
          max((col("d") === col("n_risk")).cast("int")).over(wFwd))
        .withColumn("km_nls", when(col("dead_end") === 0,
          round(sum(when(col("d") < col("n_risk"),
            round(-log(lit(1.0) - col("d").cast("double") /
              col("n_risk").cast("double")), 9))
            .cast("decimal(28,9)")).over(wFwd).cast("double"), 6)))
        .select(col("t_h"), col("n_risk"), col("d"), col("c"),
          col("haz_ppm"), col("na_ppm"), col("km_nls"))
    }),

    // ---- Zipf's-law fit over the token frequency spectrum: OLS of
    //      ln(freq) on ln(rank) for the top-1000 tokens — the
    //      power-law health check a corpus curator runs after any
    //      aggressive dedup/filter pass (a slope far from ~-1 means
    //      the frequency spectrum was distorted). Corpus-sized work is
    //      the token groupBy; the top-1000 cut is a TakeOrdered under
    //      a TOTAL order (freq desc, token asc), and the closing OLS
    //      runs over 1000 rows of round-9 ln values with exact
    //      DECIMAL moment sums. ----
    "t_zipf_fit" -> ((s, dir) => {
      val freq = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tm"))
        .filter(col("tm") =!= "")
        .groupBy("tm").agg(count(lit(1)).as("f"))
      val top = freq.orderBy(col("f").desc, col("tm").asc).limit(1000)
        // unpartitioned window: BOUNDED — runs after limit(1000)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("f").desc, col("tm").asc)))
        .withColumn("lx", round(log(col("rnk").cast("double")), 9))
        .withColumn("ly", round(log(col("f").cast("double")), 9))
      val m = top.groupBy().agg(count(lit(1)).as("k"),
        sum(col("lx").cast("decimal(28,9)")).cast("double").as("sx"),
        sum(col("ly").cast("decimal(28,9)")).cast("double").as("sy"),
        sum(round(col("lx") * col("lx"), 12).cast("decimal(38,12)"))
          .cast("double").as("sxx"),
        sum(round(col("ly") * col("ly"), 12).cast("decimal(38,12)"))
          .cast("double").as("syy"),
        sum(round(col("lx") * col("ly"), 12).cast("decimal(38,12)"))
          .cast("double").as("sxy"))
      m.select(col("k"),
        round((col("k") * col("sxy") - col("sx") * col("sy")) /
          (col("k") * col("sxx") - col("sx") * col("sx")), 6)
          .as("slope"),
        round((col("sy") - (col("k") * col("sxy") - col("sx") * col("sy")) /
          (col("k") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
          col("k").cast("double"), 6).as("intercept"),
        round(((col("k") * col("sxy") - col("sx") * col("sy")) *
          (col("k") * col("sxy") - col("sx") * col("sy"))) /
          ((col("k") * col("sxx") - col("sx") * col("sx")) *
            (col("k") * col("syy") - col("sy") * col("sy"))), 6)
          .as("r2"))
    }),

    // ---- per-source corpus diversity: language Shannon entropy
    //      (round-9 ln terms, exact DECIMAL sum) and the unbiased
    //      Simpson index as EXACT integer ppm (pair counts — no
    //      floating squares at all). Degenerate single-doc sources
    //      emit NULL simpson rather than dividing by zero. Shapes: one
    //      corpus groupBy to the (source, lang) grid; everything after
    //      is model-sized. ----
    "t_diversity_index" -> ((s, dir) => {
      val g = t(s, dir, "documents")
        .groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(false) // grid feeds totals + terms
      val n = g.groupBy("source")
        .agg(sum("cnt").as("n"), count(lit(1)).as("n_langs"))
      g.join(broadcast(n), "source")
        .withColumn("p", col("cnt").cast("double") /
          col("n").cast("double"))
        .withColumn("term",
          round(col("p") * round(log(col("p")), 9), 12))
        .groupBy("source")
        .agg(max("n").as("n_docs"), max("n_langs").as("n_langs"),
          round(-sum(col("term").cast("decimal(38,12)")).cast("double"), 6)
            .as("shannon"),
          when(max("n") > 1, lit(1000000) -
            expr("sum(cnt * (cnt - 1)) * 1000000" +
              " div (max(n) * (max(n) - 1))")).as("simpson_ppm"))
    }),

    // ---- grid-blocked 2-D nearest neighbor within radius r: each
    //      point lands in one r-sized cell, candidates come from the
    //      3x3 neighborhood equi-join (the grid guarantees every
    //      true neighbor within r is found), exact rerank picks the
    //      minimum — the planar analogue of the IVF/LSH "block then
    //      verify exactly" discipline, and the shape spatial joins
    //      take at 100 TB (shuffle on cell key, never all-pairs; the
    //      oracle IS the all-pairs form).
    //      The radius is DENSITY-DERIVED: r = 0.2·sqrt(500/n) holds
    //      the expected per-cell candidate count constant as the
    //      corpus grows (n·r² = const), so total candidate pairs stay
    //      O(n) — a fixed radius would make every cell k× denser at
    //      k× data (the round-10 probe measured exponent 1.14; this
    //      formula restores ~linear). The formula is pure IEEE
    //      arithmetic (divide, sqrt, multiply — each correctly
    //      rounded, no decimal-rounding step), so the oracle replays
    //      the identical double from its own COUNT(*). ----
    "s_grid_knn" -> ((s, dir) => {
      // Par.spread BEFORE the checkpoint (the t_dsir_weights lesson:
      // a checkpoint PINS partitioning, and the fixture scan is one
      // task) — the ×9 probe explode and the cell-key join probe both
      // read this frame at the pinned width
      val pts0 = graft.operators.Par.spread(t(s, dir, "embeddings")
          .select(col("vec_id"),
            round(element_at(col("embedding"), 1).cast("double"), 9)
              .as("x"),
            round(element_at(col("embedding"), 2).cast("double"), 9)
              .as("y")))
        .localCheckpoint(false) // count + probe side + build side
      val n = pts0.count()
      val r = 0.2 * math.sqrt(500.0 / n.toDouble)
      val r2 = r * r
      val pts = pts0
        .withColumn("cx", floor(col("x") / lit(r)))
        .withColumn("cy", floor(col("y") / lit(r)))
      val probes = pts
        .select(col("vec_id").as("q_id"), col("x").as("qx"),
          col("y").as("qy"), col("cx").as("bx"), col("cy").as("by"))
        .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
        .select(col("q_id"), col("qx"), col("qy"),
          (col("bx") + col("dx")).as("cx"), (col("by") + col("dy")).as("cy"))
      val cand = probes.join(pts, Seq("cx", "cy"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("dist2", round(
          (col("qx") - col("x")) * (col("qx") - col("x")) +
            (col("qy") - col("y")) * (col("qy") - col("y")), 12))
        .filter(col("dist2") <= lit(r2))
      cand.withColumn("rn", row_number().over(
          Window.partitionBy("q_id")
            .orderBy(col("dist2").asc, col("vec_id").asc)))
        .filter(col("rn") === 1)
        .select(col("q_id").as("vec_id"), col("vec_id").as("nn_id"),
          col("dist2"))
    }),

    // ---- distributed bootstrap CI for the mean order value: the
    //      one-pass Poisson bootstrap (each row contributes an
    //      independent Poisson(1) weight per replica — the resampling
    //      scheme that works when the corpus doesn't fit anywhere).
    //      Weights are DETERMINISTIC: md5(key, replica) -> u in [0,1)
    //      -> inverse-CDF against 9-decimal literal thresholds, so the
    //      oracle replays every draw. Per-replica means use exact
    //      DECIMAL numerators (order prices are 2-decimal; w·x is
    //      exact in both engines); the 95% CI interpolates order
    //      statistics over the B=200 replica means (a model-sized
    //      window). Corpus cost is one scan x B map-side weighted
    //      partial aggregates -> B rows cross the wire per partition. ----
    "q_bootstrap_ci" -> ((s, dir) => {
      val B = 200
      val o = t(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("x"))
        .localCheckpoint(false) // observed mean + replica fan-out
      val obs = o.groupBy().agg(count(lit(1)).as("n"),
        (sum(col("x").cast("decimal(18,2)")).cast("double") /
          count(lit(1)).cast("double")).as("mean_obs_raw"))
      val u = conv(substring(md5(concat(col("k").cast("string"),
        lit("_"), col("b").cast("string"))), 1, 15), 16, 10)
        .cast("long").cast("double") / lit(1.152921504606846976e18)
      // Poisson(1) CDF thresholds, shared literal spelling with the oracle
      val w = when(u < 0.367879441, 0L).when(u < 0.735758882, 1L)
        .when(u < 0.919698603, 2L).when(u < 0.981011843, 3L)
        .when(u < 0.996340153, 4L).when(u < 0.999405815, 5L)
        .when(u < 0.999916759, 6L).when(u < 0.999989751, 7L)
        .otherwise(8L)
      val means = o
        .withColumn("b", explode(sequence(lit(0), lit(B - 1))))
        .withColumn("w", w)
        .groupBy("b").agg(sum("w").as("mw"),
          sum((col("w") * col("x")).cast("decimal(28,2)")).as("sx"))
        .select(col("b"),
          (col("sx").cast("double") / col("mw").cast("double"))
            .as("mean"))
      // nearest-rank 2.5% / 97.5% order statistics over the B replica
      // means (integer positions — ceil(q·B) in 1-based ranks; no
      // interpolation, no fractional-position float to agree on)
      val loIdx = math.ceil(0.025 * B).toInt - 1
      val hiIdx = math.ceil(0.975 * B).toInt - 1
      // unpartitioned window: BOUNDED — over the B=200 replica means
      val rn = row_number().over(
        Window.orderBy(col("mean"), col("b"))) - 1
      means.withColumn("rn", rn)
        .groupBy()
        .agg(max(when(col("rn") === loIdx, col("mean"))).as("lo_raw"),
          max(when(col("rn") === hiIdx, col("mean"))).as("hi_raw"))
        .crossJoin(broadcast(obs))
        .select(col("n"), lit(B).as("b_reps"),
          round(col("mean_obs_raw"), 6).as("mean_obs"),
          round(col("lo_raw"), 6).as("lo95"),
          round(col("hi_raw"), 6).as("hi95"))
    }),

    // ---- randomization test for the difference in mean event value
    //      between the two user-parity variants: 199 deterministic
    //      md5-driven relabelings (Bernoulli(1/2) randomization — the
    //      scheme that needs no global shuffle), each scored with
    //      exact-DECIMAL group means in the SAME one-pass fan-out as
    //      the bootstrap; the p-value is an EXACT integer ppm count of
    //      replicas at least as extreme as observed (the +1 "observed
    //      counts itself" convention keeps it valid). ----
    "q_permutation_test" -> ((s, dir) => {
      val P = 199
      val e = t(s, dir, "events")
        .select(col("event_id").as("k"),
          (col("user_id") % 2 === 0).as("grp_a"), col("value").as("x"))
        .localCheckpoint(false) // observed stat + replica fan-out
      def meanDiff(df: DataFrame, flag: org.apache.spark.sql.Column,
                   extra: Seq[String]) =
        df.groupBy(extra.map(col): _*)
          .agg(
            (sum(when(flag, col("x")).cast("decimal(28,2)"))
              .cast("double") /
              sum(when(flag, 1L).otherwise(0L)).cast("double") -
              sum(when(!flag, col("x")).cast("decimal(28,2)"))
                .cast("double") /
                sum(when(!flag, 1L).otherwise(0L)).cast("double"))
              .as("diff"),
            sum(when(flag, 1L).otherwise(0L)).as("na"),
            sum(when(!flag, 1L).otherwise(0L)).as("nb"))
      val obs = meanDiff(e, col("grp_a"), Seq.empty)
        .select(col("diff").as("diff_obs"), col("na").as("n_a"),
          col("nb").as("n_b"))
      val perm = e
        .withColumn("p", explode(sequence(lit(0), lit(P - 1))))
      val relabeled = meanDiff(
        perm.withColumn("ua",
          conv(substring(md5(concat(col("k").cast("string"), lit("_"),
            col("p").cast("string"))), 1, 15), 16, 10)
            .cast("long").cast("double") /
            lit(1.152921504606846976e18) < lit(0.5)),
        col("ua"), Seq("p"))
      relabeled.crossJoin(broadcast(obs))
        .groupBy()
        .agg(max("n_a").as("n_a0"), max("n_b").as("n_b0"),
          round(max("diff_obs"), 6).as("diff_obs_r"),
          ((sum(when(abs(col("diff")) >= abs(col("diff_obs")), 1L)
            .otherwise(0L)) + 1L) * 1000000L).as("hits_e6"))
        .select(col("n_a0").as("n_a"), col("n_b0").as("n_b"),
          lit(P).as("n_perms"), col("diff_obs_r").as("diff_obs"),
          expr(s"hits_e6 div ${P + 1}").as("p_value_ppm"))
    }),

    // ---- CUPED variance reduction for the A/B readout: adjust each
    //      user's experiment-period outcome by their PRE-period
    //      covariate (theta = cov(x,y)/var(x) fitted pooled), the
    //      standard trick that shrinks experiment confidence intervals
    //      ~(1-rho^2)x without touching the treatment effect. Per-user
    //      sums are exact DECIMAL; theta's moments are exact DECIMAL
    //      sums of 4-decimal products (per-user totals are exact
    //      2-decimal doubles, so x*x and x*y are exact 4-decimal);
    //      the adjusted means re-enter exact accounting through a
    //      round-6 per-row quantization. Shapes: one per-user agg, one
    //      broadcast of the 1-row moment frame, one 2-group agg. ----
    "q_cuped_adjust" -> ((s, dir) => {
      val cut = lit(DriftCut).cast("timestamp")
      val pu = t(s, dir, "events")
        .groupBy((col("user_id") % 2).as("variant"), col("user_id"))
        .agg(
          coalesce(sum(when(col("ts") < cut,
            col("value").cast("decimal(18,2)"))), lit(0).cast("decimal(18,2)"))
            .cast("double").as("x"),
          coalesce(sum(when(col("ts") >= cut,
            col("value").cast("decimal(18,2)"))), lit(0).cast("decimal(18,2)"))
            .cast("double").as("y"))
        .localCheckpoint(false) // moment fit + adjusted readout
      val mom = pu.groupBy().agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(28,2)")).cast("double").as("sx"),
        sum(col("y").cast("decimal(28,2)")).cast("double").as("sy"),
        sum(round(col("x") * col("x"), 4).cast("decimal(38,4)"))
          .cast("double").as("sxx"),
        sum(round(col("x") * col("y"), 4).cast("decimal(38,4)"))
          .cast("double").as("sxy"))
        .withColumn("theta",
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")))
        .withColumn("xbar", col("sx") / col("n").cast("double"))
      pu.crossJoin(broadcast(mom))
        .withColumn("y_adj", round(
          col("y") - col("theta") * (col("x") - col("xbar")), 6))
        .groupBy("variant")
        .agg(count(lit(1)).as("n_users"),
          round(sum(col("y").cast("decimal(28,2)")).cast("double") /
            count(lit(1)).cast("double"), 6).as("mean_y"),
          round(sum(col("y_adj").cast("decimal(38,6)")).cast("double") /
            count(lit(1)).cast("double"), 6).as("mean_y_adj"),
          round(max("theta"), 6).as("theta"))
    }),

    // ---- quantile normalization of per-document scores across
    //      sources: rank within source, average the score at each rank
    //      across sources, map every document to its rank's mean —
    //      the standard cross-source calibration when score scales
    //      drift by source. Shapes: one keyed window (partitioned by
    //      source — never global), a rank-sized agg (max group size
    //      rows), equi-join back. The normalized value is an exact
    //      e6 fixed-point mean of exact longs. ----
    "q_quantile_norm" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          col("n_chars").as("score"))
      val w = Window.partitionBy("source")
        .orderBy(col("score").asc, col("doc_id").asc)
      val r = d.withColumn("rnk", row_number().over(w))
        .localCheckpoint(false) // feeds rank means + the join back
      val m = r.groupBy("rnk")
        .agg(sum("score").as("ssum"), count(lit(1)).as("scnt"))
      r.join(broadcast(m), "rnk")
        .select(col("doc_id"), col("source"), col("rnk"), col("score"),
          expr("ssum * 1000000 div scnt").as("norm_e6"))
    }),

    // ---- Welch's unequal-variance t-test between two customer
    //      segments' balances (the default two-sample mean test when
    //      variances can't be assumed equal), plus Welch-Satterthwaite
    //      df and Cohen's d effect size. Shapes: ONE corpus scan with
    //      filter pushed to parquet, five map-combinable aggregates
    //      (two counts + two exact-DECIMAL sums + two exact-DECIMAL
    //      sums of 4-dec squares — a 2-dec money value squared is
    //      exactly 4-dec, so round(x*x, 4) recovers it identically on
    //      both engines), then one identical closing IEEE tree. The
    //      significance boolean tests the ROUNDED t so a boundary ulp
    //      can't fork the flag. ----
    "q_welch_ttest" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select((col("c_mktsegment") === "BUILDING").as("is_a"),
          col("c_acctbal").as("x"))
      val m = c.groupBy().agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("is_a"), col("x")).otherwise(lit(0.0))
          .cast("decimal(28,2)")).cast("double").as("s1"),
        sum(when(!col("is_a"), col("x")).otherwise(lit(0.0))
          .cast("decimal(28,2)")).cast("double").as("s2"),
        sum(when(col("is_a"), round(col("x") * col("x"), 4))
          .otherwise(lit(0.0)).cast("decimal(38,4)")).cast("double")
          .as("q1"),
        sum(when(!col("is_a"), round(col("x") * col("x"), 4))
          .otherwise(lit(0.0)).cast("decimal(38,4)")).cast("double")
          .as("q2"))
      val n1d = col("n1").cast("double"); val n2d = col("n2").cast("double")
      val mean1 = col("s1") / n1d; val mean2 = col("s2") / n2d
      val v1 = (col("q1") - col("s1") * col("s1") / n1d) / (n1d - lit(1.0))
      val v2 = (col("q2") - col("s2") * col("s2") / n2d) / (n2d - lit(1.0))
      val se2 = v1 / n1d + v2 / n2d
      val tstat = (mean1 - mean2) / sqrt(se2)
      val dfW = se2 * se2 /
        ((v1 / n1d) * (v1 / n1d) / (n1d - lit(1.0)) +
          (v2 / n2d) * (v2 / n2d) / (n2d - lit(1.0)))
      val pooled = ((n1d - lit(1.0)) * v1 + (n2d - lit(1.0)) * v2) /
        (n1d + n2d - lit(2.0))
      m.select(col("n1"), col("n2"),
        round(mean1, 6).as("mean_a"), round(mean2, 6).as("mean_b"),
        round(v1, 4).as("var_a"), round(v2, 4).as("var_b"),
        round(tstat, 6).as("t"), round(dfW, 4).as("df"),
        round((mean1 - mean2) / sqrt(pooled), 6).as("cohen_d"),
        (abs(round(tstat, 6)) > lit(1.959964)).as("significant_05"))
    }),

    // ---- Benjamini-Hochberg FDR correction across the per-event-type
    //      family of A/B z-tests — the multiple-testing step every
    //      many-metric experiment readout needs before declaring
    //      winners. Each hypothesis is the q_ab_ztest statistic scoped
    //      to one event_type; the two-sided p comes from |z| via the
    //      Abramowitz-Stegun 26.2.17 normal-tail polynomial (libm exp
    //      enters ONCE, on a 6-dec-rounded |z|, and p rounds to 8
    //      decimals before any ranking — ulp forks sit 8 orders below
    //      the grid). The BH pass (rank by p, adj = min over j >= i of
    //      p_j*m/j, clamp to 1) runs in windows over the HYPOTHESIS
    //      FAMILY — m rows, bounded by the metric catalog, never by
    //      the corpus. ----
    // ---- sample-ratio-mismatch gate: before ANY A/B readout is
    //      trusted, check that assignment actually delivered the
    //      designed 50/50 split — a biased bucketing bug silently
    //      poisons every downstream test, and SRM is the standard
    //      tripwire (chi-square, 1 dof, against the design ratio).
    //      Counts are distinct users per variant (map-combinable);
    //      chi2 is the identical IEEE expression tree in both engines,
    //      rounded at 6. ----
    "q_srm_check" -> ((s, dir) => {
      t(s, dir, "events")
        .select((col("user_id") % 2).as("variant"), col("user_id"))
        .groupBy().agg(
          countDistinct(when(col("variant") === 0, col("user_id")))
            .as("n0"),
          countDistinct(when(col("variant") === 1, col("user_id")))
            .as("n1"))
        .withColumn("n", col("n0") + col("n1"))
        .withColumn("e", col("n").cast("double") / lit(2.0))
        .select(col("n0"), col("n1"), col("n"),
          round((col("n0").cast("double") - col("e")) *
            (col("n0").cast("double") - col("e")) / col("e") +
            (col("n1").cast("double") - col("e")) *
            (col("n1").cast("double") - col("e")) / col("e"), 6)
            .as("chi2"),
          (((col("n0").cast("double") - col("e")) *
            (col("n0").cast("double") - col("e")) / col("e") +
            (col("n1").cast("double") - col("e")) *
            (col("n1").cast("double") - col("e")) / col("e"))
            > 3.841459).as("srm_alarm"))
    }),

    // ---- Wald SPRT over the daily experiment stream: the sequential
    //      A/B readout that says STOP as soon as the evidence crosses a
    //      boundary, instead of waiting for a fixed horizon (the online
    //      form of q_ab_ztest's fixed-sample test). Each purchase is a
    //      Bernoulli trial (success = value > 150); the cumulative
    //      log-likelihood ratio for H1: p=0.10 vs H0: p=0.05 advances
    //      by exact e6-integer increments (the two ln literals are
    //      computed ONCE in Scala and inlined into both engines), and
    //      each day carries the Wald decision against ln((1-b)/a) at
    //      a=b=0.05. Shapes: one filtered corpus agg to (variant, day)
    //      grain, then a window over the CALENDAR-bounded daily series
    //      (<= 31 rows per variant) — the 100 TB cost is the first
    //      map-combinable agg, nothing else grows. ----
    "e_sprt_ab" -> ((s, dir) => {
      val lS = math.round(math.log(0.10 / 0.05) * 1e6) // success increment
      val lF = math.round(math.log(0.90 / 0.95) * 1e6) // failure increment
      val bA = math.round(math.log(0.95 / 0.05) * 1e6) // accept-H1 bound
      val daily = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("variant"),
          col("ts").cast("date").cast("string").as("day"),
          when(col("value") > 150.0, 1L).otherwise(0L).as("succ"))
        .groupBy("variant", "day")
        .agg(count(lit(1)).as("n_trials"), sum(col("succ")).as("n_succ"))
      val w = Window.partitionBy("variant").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("cum_llr_e6", sum(col("n_succ") * lS +
          (col("n_trials") - col("n_succ")) * lF).over(w))
        .withColumn("decision",
          when(col("cum_llr_e6") >= bA, "accept_h1")
            .when(col("cum_llr_e6") <= -bA, "accept_h0")
            .otherwise("continue"))
    }),

    // ---- winsorized per-type stats: clamp to [p05, p95] before the
    //      mean — the standard heavy-tail guard for reward/quality
    //      score aggregation (a mean over raw crawl scores is owned by
    //      its outliers; winsorizing bounds any single row's influence).
    //      Cutpoints are the exact interpolating percentile ROUNDED to
    //      6 decimals in BOTH engines (the round makes the clamp
    //      boundary a shared exact decimal, so the comparator can't
    //      fork on a cutpoint ulp); the mean sums exact DECIMAL(28,6)
    //      (inputs are 2-decimal values or 6-decimal cutpoints) so
    //      partition order can't move it. Shapes: one percentile agg
    //      (#types rows) broadcast back onto the scan, one keyed
    //      map-combinable agg — the corpus never shuffles. At 100 TB
    //      swap percentile for approx_percentile and keep the
    //      identical clamp algebra. ----
    "q_winsorized_stats" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_type"), col("value"))
      val cuts = e.groupBy("event_type").agg(
        round(expr("percentile(value, 0.05d)"), 6).as("p05"),
        round(expr("percentile(value, 0.95d)"), 6).as("p95"))
      e.join(broadcast(cuts), "event_type")
        .withColumn("w", least(greatest(col("value"), col("p05")), col("p95")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          first(col("p05")).as("p05"), first(col("p95")).as("p95"),
          sum(when(col("value") < col("p05"), 1L).otherwise(0L)).as("n_lo"),
          sum(when(col("value") > col("p95"), 1L).otherwise(0L)).as("n_hi"),
          round(sum(col("w").cast("decimal(28,6)")).cast("double") /
            count(lit(1)).cast("double"), 6).as("win_mean"))
    }),

    "q_bh_fdr" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_type"), (col("user_id") % 2).as("variant"),
          col("user_id"), col("value"))
      val a = e.groupBy("event_type", "variant").agg(
        countDistinct(col("user_id")).as("n"),
        countDistinct(when(col("value") > 150.0, col("user_id")))
          .as("conv"))
      val w = a.groupBy("event_type").agg(
        max(when(col("variant") === 0, col("n"))).as("n0"),
        max(when(col("variant") === 1, col("n"))).as("n1"),
        max(when(col("variant") === 0, col("conv"))).as("conv0"),
        max(when(col("variant") === 1, col("conv"))).as("conv1"))
        // degenerate hypotheses (one-variant types, pooled conversion of
        // 0 or 1) give NaN z; Spark orders NULLS FIRST vs DuckDB's
        // NULLS LAST, so they'd fork every BH rank — drop them in both
        // engines identically
        .filter(col("n0").isNotNull && col("n1").isNotNull &&
          (col("conv0") + col("conv1")) > 0 &&
          (col("conv0") + col("conv1")) < (col("n0") + col("n1")))
      val p0 = col("conv0").cast("double") / col("n0").cast("double")
      val p1 = col("conv1").cast("double") / col("n1").cast("double")
      val pp = (col("conv0") + col("conv1")).cast("double") /
        (col("n0") + col("n1")).cast("double")
      val z = (p0 - p1) / sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n0").cast("double") +
          lit(1.0) / col("n1").cast("double")))
      val scored = w.withColumn("z", round(z, 6))
        .withColumn("za", abs(col("z")))
        .withColumn("tt", lit(1.0) / (lit(1.0) + lit(0.2316419) * col("za")))
        // Horner form of the A-S b1..b5 polynomial, φ(za) factored out
        .withColumn("p", round(lit(2.0) *
          (exp(col("za") * col("za") * lit(-0.5)) *
            lit(0.3989422804014327)) *
          (col("tt") * (lit(0.319381530) + col("tt") *
            (lit(-0.356563782) + col("tt") * (lit(1.781477937) +
              col("tt") * (lit(-1.821255978) +
                col("tt") * lit(1.330274429)))))), 8))
      val mAll = scored.groupBy().agg(count(lit(1)).as("m"))
      // unpartitioned windows: BOUNDED — `scored` has one row per
      // event_type (enum-sized), never raw events
      val ord = Window.orderBy(col("p").asc, col("event_type").asc)
      val tail = Window.orderBy(col("p").asc, col("event_type").asc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      scored.crossJoin(broadcast(mAll))
        .withColumn("rnk", row_number().over(ord))
        .withColumn("p_adj", round(least(
          min(col("p") * col("m").cast("double") /
            col("rnk").cast("double")).over(tail), lit(1.0)), 8))
        .select(col("event_type"), col("n0"), col("n1"),
          col("conv0"), col("conv1"), col("z"), col("p"),
          col("rnk"), col("m"), col("p_adj"),
          (col("p_adj") <= lit(0.05)).as("reject_fdr_05"))
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q_psi_drift" ->
      s"""WITH e AS (SELECT event_type AS et, value AS v,
         |    ts < TIMESTAMP '$DriftCut' AS is_ref FROM events),
         |st AS (SELECT et, MIN(v) AS lo, MAX(v) AS hi,
         |    COUNT(*) AS n_ref FROM e WHERE is_ref GROUP BY et),
         |cn AS (SELECT et, COUNT(*) AS n_cur FROM e
         |  WHERE NOT is_ref GROUP BY et),
         |b AS (SELECT e.et,
         |    LEAST(CAST(9 AS BIGINT), GREATEST(CAST(0 AS BIGINT),
         |      CAST(FLOOR((e.v - st.lo) / ((st.hi - st.lo) / 10.0))
         |        AS BIGINT))) AS bucket,
         |    SUM(CASE WHEN e.is_ref THEN 1 ELSE 0 END) AS c_ref,
         |    SUM(CASE WHEN NOT e.is_ref THEN 1 ELSE 0 END) AS c_cur
         |  FROM e JOIN st ON e.et = st.et GROUP BY 1, 2),
         |spine AS (SELECT st.et, gs.bucket FROM st CROSS JOIN
         |  (SELECT unnest(range(0, 10)) AS bucket) gs),
         |grid AS (SELECT s.et, s.bucket,
         |    COALESCE(b.c_ref, 0) AS c_ref, COALESCE(b.c_cur, 0) AS c_cur
         |  FROM spine s LEFT JOIN b
         |    ON s.et = b.et AND s.bucket = b.bucket)
         |SELECT g.et AS event_type, MAX(st.n_ref) AS n_ref,
         |  MAX(cn.n_cur) AS n_cur,
         |  ROUND(CAST(SUM(CAST(ROUND(
         |    (CAST(g.c_cur + 1 AS DOUBLE) / CAST(cn.n_cur + 10 AS DOUBLE)
         |     - CAST(g.c_ref + 1 AS DOUBLE) / CAST(st.n_ref + 10 AS DOUBLE))
         |    * ROUND(ln(
         |      (CAST(g.c_cur + 1 AS DOUBLE) / CAST(cn.n_cur + 10 AS DOUBLE))
         |      / (CAST(g.c_ref + 1 AS DOUBLE) / CAST(st.n_ref + 10 AS DOUBLE))
         |    ), 9), 12) AS DECIMAL(38,12))) AS DOUBLE), 6) AS psi
         |FROM grid g JOIN st ON g.et = st.et JOIN cn ON g.et = cn.et
         |GROUP BY 1""".stripMargin,

    "q_chi2_independence" ->
      """WITH g AS (SELECT lang, source, COUNT(*) AS o
        |  FROM documents GROUP BY 1, 2),
        |rm AS (SELECT lang, SUM(o) AS rn FROM g GROUP BY lang),
        |cm AS (SELECT source, SUM(o) AS cn FROM g GROUP BY source),
        |dims AS (SELECT (SELECT COUNT(*) FROM rm) AS r,
        |  (SELECT COUNT(*) FROM cm) AS c, (SELECT SUM(o) FROM g) AS n),
        |terms AS (SELECT g.o, rm.rn, cm.cn, d.r, d.c, d.n,
        |    CAST(rm.rn AS DOUBLE) * CAST(cm.cn AS DOUBLE)
        |      / CAST(d.n AS DOUBLE) AS e
        |  FROM g JOIN rm USING (lang) JOIN cm USING (source)
        |  CROSS JOIN dims d),
        |agg AS (SELECT MAX(n) AS n, MAX(r) AS r, MAX(c) AS c,
        |    (MAX(r) - 1) * (MAX(c) - 1) AS df,
        |    CAST(SUM(CAST(ROUND(
        |      (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e, 9)
        |      AS DECIMAL(38,9))) AS DOUBLE) AS chi2_raw,
        |    LEAST(MAX(r), MAX(c)) AS mindim
        |  FROM terms)
        |SELECT CAST(n AS BIGINT) AS n, r, c, df,
        |  ROUND(chi2_raw, 6) AS chi2,
        |  ROUND(sqrt(chi2_raw / (CAST(n AS DOUBLE)
        |    * CAST(mindim - 1 AS DOUBLE))), 6) AS cramers_v
        |FROM agg""".stripMargin,

    "q_benford" ->
      """WITH d AS (SELECT CAST(substring(CAST(CAST(FLOOR(
        |      o_totalprice * 100.0) AS BIGINT) AS VARCHAR), 1, 1)
        |      AS INT) AS digit
        |  FROM orders),
        |cnt AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
        |spine AS (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit),
        |tot AS (SELECT SUM(n) AS tot FROM cnt)
        |SELECT s.digit, COALESCE(c.n, 0) AS n,
        |  CAST(COALESCE(c.n, 0) * 1000000 // t.tot AS BIGINT) AS obs_ppm,
        |  CAST(ROUND(ln(1.0 + 1.0 / CAST(s.digit AS DOUBLE)) / ln(10.0)
        |    * 1000000.0, 0) AS BIGINT) AS exp_ppm,
        |  CAST(ABS(COALESCE(c.n, 0) * 1000000 // t.tot
        |    - CAST(ROUND(ln(1.0 + 1.0 / CAST(s.digit AS DOUBLE))
        |      / ln(10.0) * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS dev_ppm
        |FROM spine s LEFT JOIN cnt c ON s.digit = c.digit
        |CROSS JOIN tot t""".stripMargin,

    "q_ab_ztest" ->
      """WITH e AS (SELECT user_id % 2 AS variant, user_id, event_type,
        |    value
        |  FROM events),
        |a AS (SELECT variant, COUNT(DISTINCT user_id) AS n,
        |    COUNT(DISTINCT CASE WHEN event_type = 'purchase'
        |      AND value > 150.0 THEN user_id END) AS conv
        |  FROM e GROUP BY variant),
        |w AS (SELECT
        |    MAX(CASE WHEN variant = 0 THEN n END) AS n0,
        |    MAX(CASE WHEN variant = 1 THEN n END) AS n1,
        |    MAX(CASE WHEN variant = 0 THEN conv END) AS conv0,
        |    MAX(CASE WHEN variant = 1 THEN conv END) AS conv1
        |  FROM a),
        |z AS (SELECT n0, n1, conv0, conv1,
        |    (CAST(conv0 AS DOUBLE) / CAST(n0 AS DOUBLE)
        |     - CAST(conv1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |    / sqrt((CAST(conv0 + conv1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |      * (1.0 - CAST(conv0 + conv1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |      * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
        |    AS zv
        |  FROM w)
        |SELECT n0, n1, conv0, conv1,
        |  conv0 * 1000000 // n0 AS p0_ppm,
        |  conv1 * 1000000 // n1 AS p1_ppm,
        |  ROUND(zv, 6) AS z, ABS(zv) > 1.959964 AS significant_05
        |FROM z""".stripMargin,

    "q_ks_test" ->
      """WITH o AS (SELECT o_totalprice AS x, o_orderstatus = 'F' AS is_a
        |  FROM orders WHERE o_orderstatus IN ('F', 'O')),
        |h AS (SELECT x,
        |    SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
        |    SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS cb
        |  FROM o GROUP BY x),
        |tt AS (SELECT
        |    SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS na,
        |    SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS nb FROM o),
        |c AS (SELECT x,
        |    SUM(ca) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cuma,
        |    SUM(cb) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cumb
        |  FROM h),
        |d AS (SELECT MAX(tt.na) AS n_a, MAX(tt.nb) AS n_b,
        |    MAX(ABS(c.cuma * 1000000 // tt.na
        |      - c.cumb * 1000000 // tt.nb)) AS d_e6
        |  FROM c CROSS JOIN tt)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CAST(d_e6 AS BIGINT) AS d_e6,
        |  CAST(ROUND(1.358 * sqrt(CAST(n_a + n_b AS DOUBLE)
        |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
        |    * 1000000.0, 0) AS BIGINT) AS crit_e6,
        |  d_e6 > CAST(ROUND(1.358 * sqrt(CAST(n_a + n_b AS DOUBLE)
        |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
        |    * 1000000.0, 0) AS BIGINT) AS reject_05
        |FROM d""".stripMargin,

    "q_mannwhitney_u" ->
      """WITH o AS (SELECT o_totalprice AS x, o_orderstatus = 'F' AS is_a
        |  FROM orders WHERE o_orderstatus IN ('F', 'O')),
        |h AS (SELECT x,
        |    SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
        |    SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS cb
        |  FROM o GROUP BY x),
        |r AS (SELECT ca, cb, ca + cb AS cnt,
        |    2 * COALESCE(SUM(ca + cb) OVER (ORDER BY x ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + (ca + cb) + 1 AS rank_x2
        |  FROM h),
        |tt AS (SELECT
        |    SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS na,
        |    SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS nb FROM o),
        |m AS (SELECT SUM(ca * rank_x2) AS ra_x2,
        |    SUM(cnt * cnt * cnt - cnt) AS tie_term FROM r),
        |f AS (SELECT tt.na, tt.nb,
        |    m.ra_x2 - tt.na * (tt.na + 1) AS u_a_x2, m.tie_term,
        |    tt.na + tt.nb AS nn FROM m CROSS JOIN tt),
        |z AS (SELECT na, nb, u_a_x2, tie_term,
        |    (CAST(u_a_x2 - na * nb AS DOUBLE) / 2.0)
        |    / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0
        |      * (CAST(nn + 1 AS DOUBLE) - CAST(tie_term AS DOUBLE)
        |        / (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE)))) AS zv
        |  FROM f)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(u_a_x2 AS BIGINT) AS u_a_x2,
        |  CAST(tie_term AS BIGINT) AS tie_term,
        |  ROUND(zv, 6) AS z, ABS(zv) > 1.959964 AS reject_05
        |FROM z""".stripMargin,

    "q_spearman" ->
      """WITH l AS (SELECT l_quantity AS x, l_extendedprice AS y
        |  FROM lineitem),
        |np AS (SELECT COUNT(*) + 1 AS np1 FROM l),
        |hx AS (SELECT x, COUNT(*) AS cnt FROM l GROUP BY x),
        |rx AS (SELECT x,
        |    2 * COALESCE(SUM(cnt) OVER (ORDER BY x ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt + 1 AS rx2
        |  FROM hx),
        |hy AS (SELECT y, COUNT(*) AS cnt FROM l GROUP BY y),
        |ry AS (SELECT y,
        |    2 * COALESCE(SUM(cnt) OVER (ORDER BY y ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt + 1 AS ry2
        |  FROM hy),
        |j AS (SELECT rx.rx2 - np.np1 AS cx, ry.ry2 - np.np1 AS cy
        |  FROM l JOIN rx USING (x) JOIN ry USING (y) CROSS JOIN np),
        |m AS (SELECT (SELECT np1 - 1 FROM np) AS n,
        |    CAST(SUM(CAST(cx * cy AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(cx * cx AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(cy * cy AS DECIMAL(38,0))) AS DOUBLE) AS syy
        |  FROM j)
        |SELECT n, ROUND(sxy / sqrt(sxx * syy), 6) AS rho FROM m""".stripMargin,

    "q_kendall_tau" ->
      """WITH g AS MATERIALIZED (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(l_linenumber AS BIGINT) AS y,
        |    CAST(COUNT(*) AS BIGINT) AS k
        |  FROM lineitem GROUP BY 1, 2),
        |cd AS (SELECT
        |    CAST(SUM(CASE WHEN a.y < b.y THEN a.k * b.k ELSE 0 END)
        |      AS BIGINT) AS conc,
        |    CAST(SUM(CASE WHEN a.y > b.y THEN a.k * b.k ELSE 0 END)
        |      AS BIGINT) AS disc
        |  FROM g a JOIN g b ON a.x < b.x),
        |tx AS (SELECT CAST(SUM(nx * (nx - 1) // 2) AS BIGINT) AS tx
        |  FROM (SELECT SUM(k) AS nx FROM g GROUP BY x)),
        |ty AS (SELECT CAST(SUM(ny * (ny - 1) // 2) AS BIGINT) AS ty
        |  FROM (SELECT SUM(k) AS ny FROM g GROUP BY y)),
        |nn AS (SELECT CAST(SUM(k) AS BIGINT) AS n FROM g),
        |m AS (SELECT n, CAST(n * (n - 1) // 2 AS BIGINT) AS n0,
        |    tx, ty, conc, disc
        |  FROM cd, tx, ty, nn)
        |SELECT n, n0, tx, ty, conc, disc,
        |  CAST(ROUND(CAST(conc - disc AS DOUBLE) * 1000000.0 /
        |    (SQRT(CAST(n0 - tx AS DOUBLE)) *
        |     SQRT(CAST(n0 - ty AS DOUBLE))), 0) AS BIGINT) AS tau_e6
        |FROM m""".stripMargin,

    "q_cv_kfold" ->
      """WITH f AS (SELECT
        |    CAST('0x' || substr(md5('cv:' || CAST(doc_id AS VARCHAR)),
        |      1, 4) AS BIGINT) % 5 AS fold,
        |    n_chars
        |  FROM documents),
        |per AS (SELECT fold, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |  FROM f GROUP BY fold),
        |pm AS (SELECT fold, n, sum_chars,
        |    CAST(sum_chars * 1000000 // n AS BIGINT) AS mean_e6
        |  FROM per),
        |sp AS (SELECT CAST(MAX(mean_e6) - MIN(mean_e6) AS BIGINT)
        |    AS spread_e6,
        |    CAST(MAX(n) - MIN(n) AS BIGINT) AS max_imbalance
        |  FROM pm)
        |SELECT CAST(fold AS BIGINT) AS fold, n, sum_chars, mean_e6,
        |  spread_e6, max_imbalance
        |FROM pm, sp""".stripMargin,

    "q_group_percentiles" ->
      """WITH g AS (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tc,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |cw AS (SELECT source, tc, c,
        |    CAST(SUM(c) OVER (PARTITION BY source ORDER BY tc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM g)
        |SELECT source, MAX(n) AS n,
        |  MIN(CASE WHEN cum >= (n + 9) // 10 THEN tc END) AS p10,
        |  MIN(CASE WHEN cum >= (n + 1) // 2 THEN tc END) AS p50,
        |  MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN tc END) AS p90
        |FROM cw GROUP BY source""".stripMargin,

    "e_power_analysis" ->
      """WITH agg AS (SELECT event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN value >= 10.0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS conv
        |  FROM events GROUP BY event_type),
        |pp AS (SELECT event_type, n, conv,
        |    CAST(conv AS DOUBLE) / CAST(n AS DOUBLE) AS p1
        |  FROM agg),
        |p2t AS (SELECT event_type, n, conv, p1,
        |    LEAST(p1 + 0.02, 1.0) AS p2,
        |    (p1 + LEAST(p1 + 0.02, 1.0)) / 2.0 AS pbar
        |  FROM pp),
        |nr AS (SELECT event_type, n, conv,
        |    CAST(CEIL(
        |      ((1.959964 * SQRT(2.0 * pbar * (1.0 - pbar))
        |        + 0.841621 * SQRT(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
        |       * (1.959964 * SQRT(2.0 * pbar * (1.0 - pbar))
        |        + 0.841621 * SQRT(p1 * (1.0 - p1) + p2 * (1.0 - p2))))
        |      / (0.02 * 0.02)) AS BIGINT) AS n_req
        |  FROM p2t)
        |SELECT event_type, n, conv,
        |  CAST(conv * 1000000 // n AS BIGINT) AS p_ppm, n_req,
        |  n // 2 >= n_req AS powered
        |FROM nr""".stripMargin,

    "q_loo_influence" ->
      """WITH d AS MATERIALIZED (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tc
        |  FROM documents),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
        |    CAST(SUM(tc) AS BIGINT) AS ss FROM d),
        |per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nh,
        |    CAST(SUM(tc) AS BIGINT) AS sh FROM d GROUP BY source)
        |SELECT source, nh, sh,
        |  CAST((ss - sh) * 1000000 // (nn - nh) AS BIGINT)
        |    AS loo_mean_e6,
        |  CAST(SIGN(ss * nh - nn * sh) AS INT) AS delta_sign,
        |  CAST(ABS(ss * nh - nn * sh) * 1000000 // (nn * (nn - nh))
        |    AS BIGINT) AS delta_abs_e6
        |FROM per, tot""".stripMargin,

    "q_neyman_allocation" ->
      """WITH strata AS (SELECT source,
        |    CAST(COUNT(*) AS BIGINT) AS nh,
        |    CAST(SUM(n_chars) AS BIGINT) AS sx,
        |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
        |  FROM documents GROUP BY source),
        |ns AS (SELECT source, nh,
        |    CAST(ROUND(SQRT(CAST(nh * sxx - sx * sx AS DOUBLE)), 6)
        |      AS DECIMAL(28,6)) AS nsig
        |  FROM strata),
        |tot AS (SELECT SUM(nsig) AS tot_nsig FROM ns)
        |SELECT source, nh, CAST(nsig AS DOUBLE) AS nh_sigma,
        |  CAST(ROUND(CAST(nsig AS DOUBLE) * 1000
        |    / CAST(tot_nsig AS DOUBLE), 0) AS BIGINT) AS alloc,
        |  CAST(ROUND(CAST(nsig AS DOUBLE) * 1000000
        |    / CAST(tot_nsig AS DOUBLE), 0) AS BIGINT) AS share_ppm
        |FROM ns, tot""".stripMargin,

    "q_pass_at_k" ->
      """WITH tasks AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN value >= 10.0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c
        |  FROM events GROUP BY user_id),
        |pt AS (SELECT k, n, c,
        |    list_reduce(list_prepend(1.0, list_transform(range(0, k),
        |      i -> CAST(n - c - i AS DOUBLE) / CAST(n - i AS DOUBLE))),
        |      (a, b) -> a * b) AS fail_prob
        |  FROM tasks CROSS JOIN
        |    (SELECT CAST(UNNEST([1, 5, 10]) AS BIGINT) AS k)
        |  WHERE n >= k),
        |pe AS (SELECT k,
        |    CAST(ROUND((1.0 - fail_prob) * 1000000000, 0) AS BIGINT)
        |      AS pass_e9
        |  FROM pt)
        |SELECT k, CAST(COUNT(*) AS BIGINT) AS n_tasks,
        |  CAST(SUM(pass_e9) // (COUNT(*) * 1000) AS BIGINT)
        |    AS mean_pass_e6
        |FROM pe GROUP BY k""".stripMargin,

    "q_wasserstein_1d" ->
      """WITH d AS MATERIALIZED (SELECT source,
        |    LEAST(len(string_split(text, ' ')) // 20, 9) AS bucket
        |  FROM documents),
        |per AS (SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS k
        |  FROM d GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM d GROUP BY 1),
        |qb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS kb
        |  FROM d GROUP BY 1),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM d),
        |grid AS (SELECT ns.source, qb.bucket, ns.n, qb.kb, nt.nn,
        |    CAST(COALESCE(per.k, 0) AS BIGINT) AS k
        |  FROM ns CROSS JOIN qb CROSS JOIN nt
        |  LEFT JOIN per ON per.source = ns.source
        |    AND per.bucket = qb.bucket),
        |cum AS (SELECT source, n, nn,
        |    SUM(k) OVER w AS cumk, SUM(kb) OVER w AS cumkb
        |  FROM grid WINDOW w AS (PARTITION BY source ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |agg AS (SELECT source, MAX(n) AS n, MAX(nn) AS nn,
        |    SUM(ABS(cumk * nn - cumkb * n)) AS num
        |  FROM cum GROUP BY source)
        |SELECT source, n,
        |  CAST(num * 1000000 // (n * nn) AS BIGINT) AS w1_e6
        |FROM agg""".stripMargin,

    "q_conformal_coverage" ->
      """WITH sc AS MATERIALIZED (SELECT doc_id,
        |    ABS(n_chars - 6 * len(string_split(text, ' '))) AS score
        |  FROM documents),
        |cal AS (SELECT score FROM sc WHERE doc_id % 2 = 0),
        |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
        |    CAST((9 * COUNT(*) + 18) // 10 AS BIGINT) AS k_rank
        |  FROM cal),
        |g AS (SELECT score, COUNT(*) AS c FROM cal GROUP BY score),
        |cum AS (SELECT score, SUM(c) OVER (ORDER BY score
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM g),
        |thr AS (SELECT CAST(MIN(score) AS BIGINT) AS threshold
        |  FROM cum, nc WHERE cum >= nc.k_rank),
        |ev AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
        |    CAST(SUM(CASE WHEN score <= thr.threshold THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_cov,
        |    CAST(MAX(thr.threshold) AS BIGINT) AS threshold
        |  FROM sc, thr WHERE doc_id % 2 = 1)
        |SELECT nc.n_cal, nc.k_rank, ev.threshold, ev.n_eval, ev.n_cov,
        |  CAST(n_cov * 1000000 // n_eval AS BIGINT) AS cov_ppm
        |FROM ev, nc""".stripMargin,

    "e_kaplan_meier" ->
      """WITH u AS (SELECT
        |    (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 3600000000 AS t_h,
        |    CASE WHEN MAX(ts) < TIMESTAMP '2024-01-28 00:00:00'
        |      THEN 1 ELSE 0 END AS death
        |  FROM events GROUP BY user_id),
        |rt AS (SELECT t_h, SUM(death) AS d,
        |    COUNT(*) - SUM(death) AS c
        |  FROM u GROUP BY t_h),
        |rk AS (SELECT t_h, d, c,
        |    SUM(d + c) OVER (ORDER BY t_h DESC ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS n_risk
        |  FROM rt),
        |hz AS (SELECT t_h, n_risk, d, c,
        |    d * 1000000 // n_risk AS haz_ppm,
        |    SUM(d * 1000000 // n_risk) OVER (ORDER BY t_h ASC ROWS
        |      BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS na_ppm,
        |    MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY
        |      t_h ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS dead_end,
        |    SUM(CASE WHEN d < n_risk THEN CAST(ROUND(-ln(
        |      1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)), 9)
        |      AS DECIMAL(28,9)) END) OVER (ORDER BY t_h ASC ROWS
        |      BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nls
        |  FROM rk)
        |SELECT t_h, CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(d AS BIGINT) AS d, CAST(c AS BIGINT) AS c,
        |  CAST(haz_ppm AS BIGINT) AS haz_ppm,
        |  CAST(na_ppm AS BIGINT) AS na_ppm,
        |  CASE WHEN dead_end = 0 THEN ROUND(CAST(nls AS DOUBLE), 6)
        |  END AS km_nls
        |FROM hz""".stripMargin,

    "t_zipf_fit" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS tm FROM documents),
        |freq AS (SELECT tm, COUNT(*) AS f FROM tok
        |  WHERE tm <> '' GROUP BY tm),
        |top AS (SELECT f,
        |    ROW_NUMBER() OVER (ORDER BY f DESC, tm ASC) AS rnk
        |  FROM freq ORDER BY f DESC, tm ASC LIMIT 1000),
        |pts AS (SELECT
        |    ROUND(ln(CAST(rnk AS DOUBLE)), 9) AS lx,
        |    ROUND(ln(CAST(f AS DOUBLE)), 9) AS ly
        |  FROM top),
        |m AS (SELECT COUNT(*) AS k,
        |    CAST(SUM(CAST(lx AS DECIMAL(28,9))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(ly AS DECIMAL(28,9))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(ROUND(lx * lx, 12) AS DECIMAL(38,12)))
        |      AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(ROUND(ly * ly, 12) AS DECIMAL(38,12)))
        |      AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(ROUND(lx * ly, 12) AS DECIMAL(38,12)))
        |      AS DOUBLE) AS sxy
        |  FROM pts)
        |SELECT k,
        |  ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS slope,
        |  ROUND((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx)
        |    / CAST(k AS DOUBLE), 6) AS intercept,
        |  ROUND(((k * sxy - sx * sy) * (k * sxy - sx * sy))
        |    / ((k * sxx - sx * sx) * (k * syy - sy * sy)), 6) AS r2
        |FROM m""".stripMargin,

    "t_diversity_index" ->
      """WITH g AS (SELECT source, lang, COUNT(*) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |n AS (SELECT source, SUM(cnt) AS n, COUNT(*) AS n_langs
        |  FROM g GROUP BY source)
        |SELECT g.source, CAST(MAX(n.n) AS BIGINT) AS n_docs,
        |  MAX(n.n_langs) AS n_langs,
        |  ROUND(-CAST(SUM(CAST(ROUND(
        |    (CAST(cnt AS DOUBLE) / CAST(n.n AS DOUBLE))
        |    * ROUND(ln(CAST(cnt AS DOUBLE) / CAST(n.n AS DOUBLE)), 9),
        |    12) AS DECIMAL(38,12))) AS DOUBLE), 6) AS shannon,
        |  CAST(CASE WHEN MAX(n.n) > 1 THEN 1000000
        |    - SUM(cnt * (cnt - 1)) * 1000000
        |      // (MAX(n.n) * (MAX(n.n) - 1)) END AS BIGINT) AS simpson_ppm
        |FROM g JOIN n ON g.source = n.source
        |GROUP BY g.source""".stripMargin,

    "s_grid_knn" ->
      """WITH p AS MATERIALIZED (SELECT vec_id,
        |    ROUND(CAST(embedding[1] AS DOUBLE), 9) AS x,
        |    ROUND(CAST(embedding[2] AS DOUBLE), 9) AS y
        |  FROM embeddings),
        |rr AS (SELECT CAST(0.2 AS DOUBLE)
        |    * sqrt(CAST(500.0 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
        |    AS r FROM p),
        |pairs AS (SELECT a.vec_id AS q, b.vec_id AS c,
        |    ROUND((a.x - b.x) * (a.x - b.x)
        |      + (a.y - b.y) * (a.y - b.y), 12) AS dist2
        |  FROM p a JOIN p b ON a.vec_id <> b.vec_id),
        |f AS (SELECT q, c, dist2,
        |    ROW_NUMBER() OVER (PARTITION BY q
        |      ORDER BY dist2 ASC, c ASC) AS rn
        |  FROM pairs, rr WHERE dist2 <= rr.r * rr.r)
        |SELECT q AS vec_id, c AS nn_id, dist2 FROM f WHERE rn = 1""".stripMargin,

    "q_bootstrap_ci" -> {
      val B = 200
      val loIdx = math.ceil(0.025 * B).toInt - 1
      val hiIdx = math.ceil(0.975 * B).toInt - 1
      s"""WITH o AS (SELECT o_orderkey AS k, o_totalprice AS x
         |  FROM orders),
         |obs AS (SELECT COUNT(*) AS n,
         |    CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)
         |      / CAST(COUNT(*) AS DOUBLE) AS mean_obs_raw
         |  FROM o),
         |reps AS (SELECT k, x, b FROM o CROSS JOIN
         |  (SELECT unnest(range(0, $B)) AS b)),
         |ws AS (SELECT b, x,
         |    CASE
         |      WHEN uu < 0.367879441 THEN 0
         |      WHEN uu < 0.735758882 THEN 1
         |      WHEN uu < 0.919698603 THEN 2
         |      WHEN uu < 0.981011843 THEN 3
         |      WHEN uu < 0.996340153 THEN 4
         |      WHEN uu < 0.999405815 THEN 5
         |      WHEN uu < 0.999916759 THEN 6
         |      WHEN uu < 0.999989751 THEN 7
         |      ELSE 8 END AS w
         |  FROM (SELECT b, x,
         |      CAST(CAST('0x' || substr(md5(CAST(k AS VARCHAR) || '_'
         |        || CAST(b AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE)
         |        / 1152921504606846976.0 AS uu
         |    FROM reps)),
         |m AS (SELECT b, SUM(w) AS mw,
         |    SUM(CAST(w * x AS DECIMAL(28,2))) AS sx
         |  FROM ws GROUP BY b),
         |mm AS (SELECT b,
         |    CAST(sx AS DOUBLE) / CAST(mw AS DOUBLE) AS mean FROM m),
         |r AS (SELECT mean,
         |    ROW_NUMBER() OVER (ORDER BY mean, b) - 1 AS rn FROM mm),
         |ci AS (SELECT
         |    MAX(CASE WHEN rn = $loIdx THEN mean END) AS lo_raw,
         |    MAX(CASE WHEN rn = $hiIdx THEN mean END) AS hi_raw
         |  FROM r)
         |SELECT obs.n, $B AS b_reps, ROUND(obs.mean_obs_raw, 6) AS mean_obs,
         |  ROUND(ci.lo_raw, 6) AS lo95, ROUND(ci.hi_raw, 6) AS hi95
         |FROM ci CROSS JOIN obs""".stripMargin
    },

    "q_permutation_test" -> {
      val P = 199
      s"""WITH e AS (SELECT event_id AS k, user_id % 2 = 0 AS grp_a,
         |    value AS x FROM events),
         |obs AS (SELECT
         |    CAST(SUM(CASE WHEN grp_a THEN CAST(x AS DECIMAL(28,2))
         |      END) AS DOUBLE)
         |      / CAST(SUM(CASE WHEN grp_a THEN 1 ELSE 0 END) AS DOUBLE)
         |    - CAST(SUM(CASE WHEN NOT grp_a THEN CAST(x AS DECIMAL(28,2))
         |      END) AS DOUBLE)
         |      / CAST(SUM(CASE WHEN NOT grp_a THEN 1 ELSE 0 END)
         |        AS DOUBLE) AS diff_obs,
         |    SUM(CASE WHEN grp_a THEN 1 ELSE 0 END) AS n_a,
         |    SUM(CASE WHEN NOT grp_a THEN 1 ELSE 0 END) AS n_b
         |  FROM e),
         |perm AS (SELECT k, x, p,
         |    CAST(CAST('0x' || substr(md5(CAST(k AS VARCHAR) || '_'
         |      || CAST(p AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE)
         |      / 1152921504606846976.0 < 0.5 AS ua
         |  FROM e CROSS JOIN (SELECT unnest(range(0, $P)) AS p)),
         |st AS (SELECT p,
         |    CAST(SUM(CASE WHEN ua THEN CAST(x AS DECIMAL(28,2)) END)
         |        AS DOUBLE)
         |      / CAST(SUM(CASE WHEN ua THEN 1 ELSE 0 END) AS DOUBLE)
         |    - CAST(SUM(CASE WHEN NOT ua THEN CAST(x AS DECIMAL(28,2))
         |        END) AS DOUBLE)
         |      / CAST(SUM(CASE WHEN NOT ua THEN 1 ELSE 0 END) AS DOUBLE)
         |      AS diff
         |  FROM perm GROUP BY p)
         |SELECT CAST(obs.n_a AS BIGINT) AS n_a,
         |  CAST(obs.n_b AS BIGINT) AS n_b, $P AS n_perms,
         |  ROUND(obs.diff_obs, 6) AS diff_obs,
         |  CAST((SUM(CASE WHEN ABS(st.diff) >= ABS(obs.diff_obs)
         |    THEN 1 ELSE 0 END) + 1) * 1000000 // ${P + 1} AS BIGINT)
         |    AS p_value_ppm
         |FROM st CROSS JOIN obs
         |GROUP BY obs.n_a, obs.n_b, obs.diff_obs""".stripMargin
    },

    "q_cuped_adjust" ->
      s"""WITH pu AS (SELECT user_id % 2 AS variant, user_id,
         |    CAST(COALESCE(SUM(CASE WHEN ts < TIMESTAMP '$DriftCut'
         |      THEN CAST(value AS DECIMAL(18,2)) END),
         |      CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS x,
         |    CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '$DriftCut'
         |      THEN CAST(value AS DECIMAL(18,2)) END),
         |      CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS y
         |  FROM events GROUP BY 1, 2),
         |mom AS (SELECT COUNT(*) AS n,
         |    CAST(SUM(CAST(x AS DECIMAL(28,2))) AS DOUBLE) AS sx,
         |    CAST(SUM(CAST(y AS DECIMAL(28,2))) AS DOUBLE) AS sy,
         |    CAST(SUM(CAST(ROUND(x * x, 4) AS DECIMAL(38,4)))
         |      AS DOUBLE) AS sxx,
         |    CAST(SUM(CAST(ROUND(x * y, 4) AS DECIMAL(38,4)))
         |      AS DOUBLE) AS sxy
         |  FROM pu),
         |th AS (SELECT n, sx,
         |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta,
         |    sx / CAST(n AS DOUBLE) AS xbar
         |  FROM mom),
         |adj AS (SELECT pu.variant, pu.y,
         |    ROUND(pu.y - th.theta * (pu.x - th.xbar), 6) AS y_adj,
         |    th.theta
         |  FROM pu CROSS JOIN th)
         |SELECT variant, COUNT(*) AS n_users,
         |  ROUND(CAST(SUM(CAST(y AS DECIMAL(28,2))) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE), 6) AS mean_y,
         |  ROUND(CAST(SUM(CAST(y_adj AS DECIMAL(38,6))) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE), 6) AS mean_y_adj,
         |  ROUND(MAX(theta), 6) AS theta
         |FROM adj GROUP BY variant""".stripMargin,

    "q_quantile_norm" ->
      """WITH d AS (SELECT doc_id, source, n_chars AS score
        |  FROM documents),
        |r AS (SELECT doc_id, source, score,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY score ASC, doc_id ASC) AS rnk
        |  FROM d),
        |m AS (SELECT rnk, SUM(score) AS ssum, COUNT(*) AS scnt
        |  FROM r GROUP BY rnk)
        |SELECT r.doc_id, r.source, r.rnk, r.score,
        |  CAST(m.ssum * 1000000 // m.scnt AS BIGINT) AS norm_e6
        |FROM r JOIN m USING (rnk)""".stripMargin,

    "q_welch_ttest" ->
      """WITH c AS (SELECT c_mktsegment = 'BUILDING' AS is_a,
        |    c_acctbal AS x
        |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |m AS (SELECT
        |    CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(SUM(CAST(CASE WHEN is_a THEN x ELSE 0.0 END
        |      AS DECIMAL(28,2))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(CASE WHEN NOT is_a THEN x ELSE 0.0 END
        |      AS DECIMAL(28,2))) AS DOUBLE) AS s2,
        |    CAST(SUM(CAST(CASE WHEN is_a THEN ROUND(x * x, 4) ELSE 0.0 END
        |      AS DECIMAL(38,4))) AS DOUBLE) AS q1,
        |    CAST(SUM(CAST(CASE WHEN NOT is_a THEN ROUND(x * x, 4)
        |      ELSE 0.0 END AS DECIMAL(38,4))) AS DOUBLE) AS q2
        |  FROM c),
        |v AS (SELECT n1, n2,
        |    s1 / CAST(n1 AS DOUBLE) AS mean1,
        |    s2 / CAST(n2 AS DOUBLE) AS mean2,
        |    (q1 - s1 * s1 / CAST(n1 AS DOUBLE))
        |      / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
        |    (q2 - s2 * s2 / CAST(n2 AS DOUBLE))
        |      / (CAST(n2 AS DOUBLE) - 1.0) AS v2
        |  FROM m),
        |se AS (SELECT n1, n2, mean1, mean2, v1, v2,
        |    v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE) AS se2
        |  FROM v)
        |SELECT n1, n2,
        |  ROUND(mean1, 6) AS mean_a, ROUND(mean2, 6) AS mean_b,
        |  ROUND(v1, 4) AS var_a, ROUND(v2, 4) AS var_b,
        |  ROUND((mean1 - mean2) / sqrt(se2), 6) AS t,
        |  ROUND(se2 * se2 /
        |    ((v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE))
        |       / (CAST(n1 AS DOUBLE) - 1.0)
        |     + (v2 / CAST(n2 AS DOUBLE)) * (v2 / CAST(n2 AS DOUBLE))
        |       / (CAST(n2 AS DOUBLE) - 1.0)), 4) AS df,
        |  ROUND((mean1 - mean2) / sqrt(
        |    ((CAST(n1 AS DOUBLE) - 1.0) * v1
        |     + (CAST(n2 AS DOUBLE) - 1.0) * v2)
        |    / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)), 6)
        |    AS cohen_d,
        |  ABS(ROUND((mean1 - mean2) / sqrt(se2), 6)) > 1.959964
        |    AS significant_05
        |FROM se""".stripMargin,

    "q_srm_check" ->
      """WITH a AS (SELECT
        |    COUNT(DISTINCT CASE WHEN user_id % 2 = 0 THEN user_id END)
        |      AS n0,
        |    COUNT(DISTINCT CASE WHEN user_id % 2 = 1 THEN user_id END)
        |      AS n1
        |  FROM events),
        |b AS (SELECT n0, n1, n0 + n1 AS n,
        |    CAST(n0 + n1 AS DOUBLE) / 2.0 AS e FROM a)
        |SELECT n0, n1, n,
        |  ROUND((CAST(n0 AS DOUBLE) - e) * (CAST(n0 AS DOUBLE) - e) / e
        |    + (CAST(n1 AS DOUBLE) - e) * (CAST(n1 AS DOUBLE) - e) / e, 6)
        |    AS chi2,
        |  ((CAST(n0 AS DOUBLE) - e) * (CAST(n0 AS DOUBLE) - e) / e
        |    + (CAST(n1 AS DOUBLE) - e) * (CAST(n1 AS DOUBLE) - e) / e)
        |    > 3.841459 AS srm_alarm
        |FROM b""".stripMargin,

    "e_sprt_ab" -> {
      val lS = math.round(math.log(0.10 / 0.05) * 1e6)
      val lF = math.round(math.log(0.90 / 0.95) * 1e6)
      val bA = math.round(math.log(0.95 / 0.05) * 1e6)
      s"""WITH d AS (SELECT user_id % 2 AS variant,
         |    CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         |    CASE WHEN value > 150.0 THEN 1 ELSE 0 END AS succ
         |  FROM events WHERE event_type = 'purchase'),
         |g AS (SELECT variant, day, COUNT(*) AS n_trials,
         |    CAST(SUM(succ) AS BIGINT) AS n_succ
         |  FROM d GROUP BY variant, day),
         |c AS (SELECT variant, day, n_trials, n_succ,
         |    CAST(SUM(n_succ * $lS + (n_trials - n_succ) * ($lF))
         |      OVER (PARTITION BY variant ORDER BY day ASC
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_llr_e6
         |  FROM g)
         |SELECT variant, day, n_trials, n_succ, cum_llr_e6,
         |  CASE WHEN cum_llr_e6 >= $bA THEN 'accept_h1'
         |    WHEN cum_llr_e6 <= -$bA THEN 'accept_h0'
         |    ELSE 'continue' END AS decision
         |FROM c""".stripMargin
    },

    "q_winsorized_stats" ->
      """WITH c AS (SELECT event_type,
        |    ROUND(quantile_cont(value, 0.05), 6) AS p05,
        |    ROUND(quantile_cont(value, 0.95), 6) AS p95
        |  FROM events GROUP BY event_type),
        |j AS (SELECT e.event_type, e.value, c.p05, c.p95,
        |    LEAST(GREATEST(e.value, c.p05), c.p95) AS w
        |  FROM events e JOIN c USING (event_type))
        |SELECT event_type, COUNT(*) AS n, MAX(p05) AS p05,
        |  MAX(p95) AS p95,
        |  CAST(SUM(CASE WHEN value < p05 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_lo,
        |  CAST(SUM(CASE WHEN value > p95 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hi,
        |  ROUND(CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS win_mean
        |FROM j GROUP BY event_type""".stripMargin,

    "q_bh_fdr" ->
      """WITH e AS (SELECT event_type, user_id % 2 AS variant, user_id,
        |    value
        |  FROM events),
        |a AS (SELECT event_type, variant,
        |    COUNT(DISTINCT user_id) AS n,
        |    COUNT(DISTINCT CASE WHEN value > 150.0 THEN user_id END)
        |      AS conv
        |  FROM e GROUP BY event_type, variant),
        |w AS (SELECT event_type,
        |    MAX(CASE WHEN variant = 0 THEN n END) AS n0,
        |    MAX(CASE WHEN variant = 1 THEN n END) AS n1,
        |    MAX(CASE WHEN variant = 0 THEN conv END) AS conv0,
        |    MAX(CASE WHEN variant = 1 THEN conv END) AS conv1
        |  FROM a GROUP BY event_type),
        |z AS (SELECT event_type, n0, n1, conv0, conv1,
        |    ROUND((CAST(conv0 AS DOUBLE) / CAST(n0 AS DOUBLE)
        |      - CAST(conv1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |    / sqrt((CAST(conv0 + conv1 AS DOUBLE)
        |        / CAST(n0 + n1 AS DOUBLE))
        |      * (1.0 - CAST(conv0 + conv1 AS DOUBLE)
        |        / CAST(n0 + n1 AS DOUBLE))
        |      * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))), 6)
        |      AS z
        |  FROM w WHERE n0 IS NOT NULL AND n1 IS NOT NULL
        |    AND conv0 + conv1 > 0 AND conv0 + conv1 < n0 + n1),
        |tt AS (SELECT *, ABS(z) AS za,
        |    1.0 / (1.0 + 0.2316419 * ABS(z)) AS t1
        |  FROM z),
        |p AS (SELECT event_type, n0, n1, conv0, conv1, z,
        |    ROUND(2.0 * (exp(za * za * -0.5) * 0.3989422804014327)
        |      * (t1 * (0.319381530 + t1 * (-0.356563782 + t1 *
        |          (1.781477937 + t1 * (-1.821255978
        |            + t1 * 1.330274429))))), 8) AS p
        |  FROM tt),
        |r AS (SELECT *,
        |    ROW_NUMBER() OVER (ORDER BY p ASC, event_type ASC) AS rnk,
        |    COUNT(*) OVER () AS m
        |  FROM p),
        |adj AS (SELECT *,
        |    ROUND(LEAST(MIN(p * CAST(m AS DOUBLE) / CAST(rnk AS DOUBLE))
        |      OVER (ORDER BY p ASC, event_type ASC
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
        |      1.0), 8) AS p_adj
        |  FROM r)
        |SELECT event_type, n0, n1, conv0, conv1, z, p, rnk, m, p_adj,
        |  p_adj <= 0.05 AS reject_fdr_05
        |FROM adj""".stripMargin
  )
}

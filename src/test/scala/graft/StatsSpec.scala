package graft

import java.sql.Timestamp

/** Semantic pins for the statistical-testing queries (the DuckDB
  * oracle pins exact values; these assert the invariants that DEFINE
  * each statistic, independent of fixture content — and replay the
  * distributed prefix-sum / blocking machinery against naive local
  * computations).
  */
class StatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_ks_test: distributed ECDF equals the naive local replay") {
    val out = SparkEntry.queries("q_ks_test")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    val (nA, nB, dE6, critE6) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))

    // naive replay: collect both samples, walk the merged value grid
    val rows = Tables.t(spark, dir, "orders")
      .filter("o_orderstatus IN ('F','O')")
      .selectExpr("o_totalprice", "o_orderstatus = 'F'")
      .collect().map(x => (x.getDouble(0), x.getBoolean(1)))
    val a = rows.filter(_._2).map(_._1).sorted
    val b = rows.filterNot(_._2).map(_._1).sorted
    assert(nA == a.length && nB == b.length)
    val grid = (a ++ b).distinct.sorted
    val naive = grid.map { v =>
      val ca = a.count(_ <= v); val cb = b.count(_ <= v)
      math.abs(ca * 1000000L / nA - cb * 1000000L / nB)
    }.max
    assert(dE6 == naive, s"distributed D=$dE6 != naive $naive")
    assert(r.getBoolean(4) == (dE6 > critE6))
  }

  test("q_psi_drift: nonnegative terms, counts conserved per type") {
    val out = SparkEntry.queries("q_psi_drift")(spark, dir).collect()
    assert(out.nonEmpty)
    val byType = Tables.t(spark, dir, "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      // each PSI term (x-y)·ln(x/y) is >= 0, so the sum is
      assert(r.getDouble(3) >= 0.0, s"PSI negative for ${r.get(0)}")
      assert(r.getLong(1) + r.getLong(2) == byType(r.getString(0)),
        s"ref+cur must partition the type count for ${r.get(0)}")
    }
  }

  test("e_kaplan_meier: risk-set accounting and monotone hazard replay") {
    val out = SparkEntry.queries("e_kaplan_meier")(spark, dir)
      .orderBy("t_h").collect()
    assert(out.nonEmpty)
    val users = Tables.t(spark, dir, "events")
      .select("user_id").distinct().count()
    // the earliest row's risk set is everyone
    assert(out.head.getLong(1) == users)
    // n_risk is the reverse cumulative of (d+c); na_ppm replays the
    // exact integer hazard sum; both monotone the right way
    var remaining = users; var na = 0L; var prevNls = -1.0
    out.foreach { r =>
      assert(r.getLong(1) == remaining, s"n_risk wrong at t=${r.get(0)}")
      remaining -= r.getLong(2) + r.getLong(3)
      assert(r.getLong(4) == r.getLong(2) * 1000000L / r.getLong(1))
      na += r.getLong(4)
      assert(r.getLong(5) == na, s"na_ppm wrong at t=${r.get(0)}")
      if (!r.isNullAt(6)) {
        assert(r.getDouble(6) >= prevNls - 1e-9,
          s"-log S(t) must be nondecreasing at t=${r.get(0)}")
        prevNls = r.getDouble(6)
      }
    }
    assert(remaining == 0, "risk set must drain to zero")
  }

  test("q_benford: digit partition is exhaustive and ppm masses close") {
    val out = SparkEntry.queries("q_benford")(spark, dir)
      .orderBy("digit").collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to 9))
    val orders = Tables.t(spark, dir, "orders").count()
    assert(out.map(_.getLong(1)).sum == orders)
    // floor-div truncation loses < 9 ppm total; Benford masses sum to 1
    val obs = out.map(_.getLong(2)).sum
    assert(obs > 999990L && obs <= 1000000L, s"obs_ppm sum $obs")
    val exp = out.map(_.getLong(3)).sum
    assert(math.abs(exp - 1000000L) <= 5, s"exp_ppm sum $exp")
  }

  test("q_ab_ztest: exposures partition users, z sign follows rates") {
    val r = SparkEntry.queries("q_ab_ztest")(spark, dir).collect().head
    val users = Tables.t(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(1) == users)
    assert(r.getLong(2) <= r.getLong(0) && r.getLong(3) <= r.getLong(1))
    val z = r.getDouble(6)
    assert(math.signum(z) ==
      math.signum((r.getLong(4) - r.getLong(5)).toDouble))
    assert(r.getBoolean(7) == (math.abs(z) > 1.959964))
  }

  test("q_quantile_norm: ranks are per-source permutations, means monotone") {
    val out = SparkEntry.queries("q_quantile_norm")(spark, dir).collect()
    val docs = Tables.t(spark, dir, "documents").count()
    assert(out.length == docs)
    out.groupBy(_.getString(1)).foreach { case (src, rows) =>
      val ranks = rows.map(_.getInt(2)).sorted
      assert(ranks.toSeq == (1 to rows.length),
        s"ranks must be a permutation within $src")
    }
    // the normalized value is a mean of nondecreasing order statistics
    val byRank = out.map(r => (r.getInt(2), r.getLong(4))).distinct
      .sortBy(_._1)
    assert(byRank.sliding(2).forall {
      case Array((_, a), (_, b)) => a <= b
      case _ => true
    }, "rank means must be nondecreasing")
  }

  test("t_zipf_fit: negative slope, r2 in [0,1], k bounded by vocab") {
    val r = SparkEntry.queries("t_zipf_fit")(spark, dir).collect().head
    assert(r.getLong(0) <= 1000)
    assert(r.getDouble(1) < 0.0, "token spectra must decay")
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }

  test("t_diversity_index: entropy bounded by ln(n_langs), simpson in range") {
    val out = SparkEntry.queries("t_diversity_index")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val h = r.getDouble(3)
      assert(h >= -1e-9, s"entropy negative for ${r.get(0)}")
      assert(h <= math.log(r.getLong(2).toDouble) + 1e-6,
        s"entropy above ln(n_langs) for ${r.get(0)}")
      if (!r.isNullAt(4))
        assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000)
    }
  }

  test("s_grid_knn: grid-blocked result equals brute force exactly") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("s_grid_knn")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val pts = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"),
        round(element_at(col("embedding"), 1).cast("double"), 9),
        round(element_at(col("embedding"), 2).cast("double"), 9))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // the density-derived radius, replayed with the same IEEE formula
    val rad = 0.2 * math.sqrt(500.0 / pts.length.toDouble)
    val rad2 = rad * rad
    val brute = pts.flatMap { case (id, x, y) =>
      val cands = pts.filter(_._1 != id).map { case (jd, xj, yj) =>
        val d2 = BigDecimal((x - xj) * (x - xj) + (y - yj) * (y - yj))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
        (jd, d2)
      }.filter(_._2 <= rad2)
      if (cands.isEmpty) None
      else Some {
        val (jd, d2) = cands.minBy(c => (c._2, c._1))
        (id, jd, d2)
      }
    }.sortBy(_._1)
    assert(out.toSeq == brute.toSeq,
      "grid blocking must lose nothing within the radius")
  }

  test("s_silhouette: partition sizes conserved, scores in [-1,1]") {
    val out = SparkEntry.queries("s_silhouette")(spark, dir).collect()
    val n = Tables.t(spark, dir, "embeddings").count()
    assert(out.map(_.getLong(1)).sum == n)
    out.foreach { r =>
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0) }
  }

  test("q_mannwhitney_u: exact U and ties replay the naive local ranking") {
    val r = SparkEntry.queries("q_mannwhitney_u")(spark, dir)
      .collect().head
    val rows = Tables.t(spark, dir, "orders")
      .filter("o_orderstatus IN ('F','O')")
      .selectExpr("o_totalprice", "o_orderstatus = 'F'")
      .collect().map(x => (x.getDouble(0), x.getBoolean(1)))
    val nA = rows.count(_._2); val nB = rows.length - nA
    assert(r.getLong(0) == nA && r.getLong(1) == nB)
    // naive average ranks in x2 units over the merged sample
    val byVal = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var before = 0L; var raX2 = 0L; var tie = 0L
    byVal.foreach { case (_, vs) =>
      val cnt = vs.length.toLong
      val rankX2 = 2 * before + cnt + 1
      raX2 += vs.count(_._2) * rankX2
      tie += cnt * cnt * cnt - cnt
      before += cnt
    }
    assert(r.getLong(2) == raX2 - nA.toLong * (nA + 1), "U_A mismatch")
    assert(r.getLong(3) == tie, "tie term mismatch")
  }

  test("q_spearman: tie-aware rho replays locally and is in [-1,1]") {
    val r = SparkEntry.queries("q_spearman")(spark, dir).collect().head
    val rho = r.getDouble(1)
    assert(rho >= -1.0 && rho <= 1.0)
    val rows = Tables.t(spark, dir, "lineitem")
      .selectExpr("l_quantity", "l_extendedprice")
      .collect().map(x => (x.getDouble(0), x.getDouble(1)))
    assert(r.getLong(0) == rows.length)
    def ranksX2(vs: Array[Double]): Map[Double, Long] = {
      var before = 0L
      vs.groupBy(identity).toSeq.sortBy(_._1).map { case (v, g) =>
        val cnt = g.length.toLong
        val rk = 2 * before + cnt + 1
        before += cnt
        v -> rk
      }.toMap
    }
    val rx = ranksX2(rows.map(_._1)); val ry = ranksX2(rows.map(_._2))
    val np1 = rows.length + 1L
    var sxy = BigInt(0); var sxx = BigInt(0); var syy = BigInt(0)
    rows.foreach { case (x, y) =>
      val cx = BigInt(rx(x) - np1); val cy = BigInt(ry(y) - np1)
      sxy += cx * cy; sxx += cx * cx; syy += cy * cy
    }
    val naive = sxy.toDouble / math.sqrt(sxx.toDouble * syy.toDouble)
    assert(math.abs(rho - naive) < 1e-6, s"rho $rho != naive $naive")
  }

  test("q_bootstrap_ci: CI brackets the mean and tightens with n") {
    val r = SparkEntry.queries("q_bootstrap_ci")(spark, dir)
      .collect().head
    val (mean, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(lo <= hi)
    assert(lo <= mean && mean <= hi,
      "a 95% bootstrap CI must bracket the point estimate here")
    assert(r.getLong(0) == Tables.t(spark, dir, "orders").count())
    assert(r.getInt(1) == 200)
    // 10x the data → a materially tighter interval
    val r10 = SparkEntry.queries("q_bootstrap_ci")(
      spark, "/root/testdata/sf0.01").collect().head
    assert(r10.getDouble(4) - r10.getDouble(3) < hi - lo,
      "CI width must shrink as n grows")
  }

  test("q_permutation_test: p-value replays the md5 relabeling exactly") {
    val r = SparkEntry.queries("q_permutation_test")(spark, dir)
      .collect().head
    val rows = Tables.t(spark, dir, "events")
      .selectExpr("event_id", "user_id % 2 = 0", "value").collect()
      .map(x => (x.getLong(0), x.getBoolean(1), x.getDouble(2)))
    assert(r.getLong(0) == rows.count(_._2))
    assert(r.getLong(1) == rows.length - rows.count(_._2))
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(k: Long, p: Int): Double = {
      val hex = md.digest(s"${k}_$p".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16).toDouble / 1.152921504606846976e18
    }
    def diff(vals: Seq[(Boolean, Double)]): Double = {
      def m(g: Seq[Double]) =
        g.map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble / g.length
      m(vals.filter(_._1).map(_._2)) - m(vals.filterNot(_._1).map(_._2))
    }
    val obs = diff(rows.map(t => (t._2, t._3)))
    val hits = (0 until 199).count { p =>
      math.abs(diff(rows.map(t => (u(t._1, p) < 0.5, t._3)))) >=
        math.abs(obs)
    }
    assert(r.getLong(4) == (hits + 1) * 1000000L / 200,
      "p-value must replay the deterministic relabeling")
  }

  test("e_acf: Cauchy-Schwarz bound and dense-series pair counts") {
    val out = SparkEntry.queries("e_acf")(spark, dir)
      .orderBy("k").collect()
    assert(out.length == 24)
    out.foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9,
        s"|acf| > 1 at lag ${r.get(0)}") }
    // exact local replay from the hourly counts
    val hours = Tables.t(spark, dir, "events")
      .selectExpr("unix_micros(date_trunc('HOUR', ts))" +
        " div 3600000000 AS he")
      .groupBy("he").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val n = hours.size.toLong; val sx = hours.values.sum
    val c = hours.map { case (he, x) => he -> (n * x - sx) }
    val den = c.values.map(v => BigInt(v) * BigInt(v)).sum
    out.foreach { r =>
      val k = r.getInt(0)
      val pairs = c.toSeq.flatMap { case (he, ca) =>
        c.get(he + k).map(cb => (ca, cb)) }
      assert(r.getLong(1) == pairs.length, s"n_pairs wrong at lag $k")
      val num = pairs.map { case (a, b) => BigInt(a) * BigInt(b) }.sum
      val naive = BigDecimal(num.toDouble / den.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - naive) < 1e-9,
        s"acf mismatch at lag $k")
    }
  }

  test("q_cuped_adjust: mean-preserving, variance-reducing") {
    val out = SparkEntry.queries("q_cuped_adjust")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    assert(out.length == 2)
    // theta is a single pooled fit
    assert(out(0)._5 == out(1)._5)
    // adjustment must not move the POOLED mean (sum of theta terms
    // telescopes to zero over all users, up to round-6 quanta)
    val pooledY = out.map(v => v._3 * v._2).sum / out.map(_._2).sum
    val pooledAdj = out.map(v => v._4 * v._2).sum / out.map(_._2).sum
    assert(math.abs(pooledY - pooledAdj) < 1e-3,
      s"CUPED moved the pooled mean: $pooledY -> $pooledAdj")
    // and it must reduce variance: replay per-user (x, y) locally
    val cut = Timestamp.valueOf("2024-01-16 00:00:00")
    val per = Tables.t(spark, dir, "events")
      .selectExpr("user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      .groupBy(_._1).map { case (_, es) =>
        (es.filter(_._2.before(cut)).map(_._3).sum,
          es.filterNot(_._2.before(cut)).map(_._3).sum)
      }.toArray
    val n = per.length
    def meanOf(v: Array[Double]) = v.sum / n
    def varOf(v: Array[Double]) = {
      val m = meanOf(v); v.map(a => (a - m) * (a - m)).sum / n
    }
    val xs = per.map(_._1); val ys = per.map(_._2)
    val theta = out(0)._5
    val yAdj = per.map { case (x, y) => y - theta * (x - meanOf(xs)) }
    assert(varOf(yAdj) < varOf(ys),
      "CUPED must reduce outcome variance on a correlated covariate")
  }

  test("q_chi2_independence: dims match the grid, V in [0,1]") {
    val r = SparkEntry.queries("q_chi2_independence")(spark, dir)
      .collect().head
    val docs = Tables.t(spark, dir, "documents")
    assert(r.getLong(0) == docs.count())
    assert(r.getLong(1) == docs.select("lang").distinct().count())
    assert(r.getLong(2) == docs.select("source").distinct().count())
    assert(r.getLong(3) == (r.getLong(1) - 1) * (r.getLong(2) - 1))
    assert(r.getDouble(4) >= 0.0)
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
  }

  test("q_welch_ttest: matches the naive local replay") {
    val out = SparkEntry.queries("q_welch_ttest")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    val rows = Tables.t(spark, dir, "customer")
      .filter("c_mktsegment IN ('BUILDING','MACHINERY')")
      .selectExpr("c_mktsegment = 'BUILDING'", "c_acctbal")
      .collect().map(x => (x.getBoolean(0), x.getDouble(1)))
    val a = rows.filter(_._1).map(_._2); val b = rows.filterNot(_._1).map(_._2)
    assert(r.getLong(0) == a.length && r.getLong(1) == b.length)
    def mv(v: Array[Double]) = {
      val m = v.sum / v.length
      (m, v.map(x => (x - m) * (x - m)).sum / (v.length - 1))
    }
    val (m1, v1) = mv(a); val (m2, v2) = mv(b)
    val se2 = v1 / a.length + v2 / b.length
    val tN = (m1 - m2) / math.sqrt(se2)
    val dfN = se2 * se2 /
      (math.pow(v1 / a.length, 2) / (a.length - 1) +
        math.pow(v2 / b.length, 2) / (b.length - 1))
    assert(math.abs(r.getDouble(2) - m1) < 1e-4)
    assert(math.abs(r.getDouble(3) - m2) < 1e-4)
    assert(math.abs(r.getDouble(6) - tN) < 1e-4, s"t=${r.getDouble(6)} vs $tN")
    assert(math.abs(r.getDouble(7) - dfN) < 1e-2)
    // Welch df sits between the conservative and pooled bounds
    assert(r.getDouble(7) >= math.min(a.length, b.length) - 1 - 1e-9)
    assert(r.getDouble(7) <= a.length + b.length - 2 + 1e-9)
  }

  test("q_bh_fdr: p-values valid, adjustment monotone and anchored") {
    val out = SparkEntry.queries("q_bh_fdr")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(5), r.getDouble(6),
        r.getInt(7), r.getLong(8), r.getDouble(9)))
      .sortBy(_._4)
    val m = out.head._5
    assert(out.length == m.toInt)
    // p from z replays the A-S 26.2.17 polynomial exactly
    out.foreach { case (_, z, p, _, _, _) =>
      val za = math.abs(z)
      val t1 = 1.0 / (1.0 + 0.2316419 * za)
      val phi = math.exp(-za * za / 2.0) * 0.3989422804014327
      val pN = 2.0 * phi * (t1 * (0.319381530 + t1 * (-0.356563782 +
        t1 * (1.781477937 + t1 * (-1.821255978 + t1 * 1.330274429)))))
      assert(p >= 0.0 && p <= 1.0 && math.abs(p - pN) < 1e-7)
    }
    // BH: adjusted p is >= raw p, nondecreasing in rank, and the last
    // rank's adjustment is its own p (times m/m), clamped to 1
    out.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0)._6 <= w(1)._6 + 1e-12) }
    out.foreach { case (_, _, p, _, _, adj) => assert(adj >= p - 1e-8) }
    assert(math.abs(out.last._6 - math.min(out.last._3, 1.0)) < 1e-8)
  }
  test("q_kendall_tau: naive grid replay of tau-b") {
    val rows = Tables.t(spark, dir, "lineitem")
      .selectExpr("cast(l_quantity as long)", "cast(l_linenumber as long)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val grid = rows.groupBy(identity).map { case (k, v) =>
      (k._1, k._2, v.length.toLong) }.toVector
    var conc = 0L; var disc = 0L
    for (a <- grid; b <- grid if a._1 < b._1) {
      if (a._2 < b._2) conc += a._3 * b._3
      else if (a._2 > b._2) disc += a._3 * b._3
    }
    val n = rows.length.toLong
    val n0 = n * (n - 1) / 2
    def ties(xs: Map[Long, Long]) =
      xs.values.map(c => c * (c - 1) / 2).sum
    val tx = ties(rows.groupBy(_._1).map { case (k, v) =>
      k -> v.length.toLong })
    val ty = ties(rows.groupBy(_._2).map { case (k, v) =>
      k -> v.length.toLong })
    val r = SparkEntry.queries("q_kendall_tau")(spark, dir)
      .collect().head
    assert(r.getLong(0) == n && r.getLong(1) == n0)
    assert(r.getLong(2) == tx && r.getLong(3) == ty)
    assert(r.getLong(4) == conc && r.getLong(5) == disc)
    val tau = math.round((conc - disc).toDouble * 1e6 /
      (math.sqrt((n0 - tx).toDouble) * math.sqrt((n0 - ty).toDouble)))
    assert(r.getLong(6) == tau, s"tau_e6 ${r.getLong(6)} != $tau")
    // tau-b must sit inside [-1, 1]
    assert(math.abs(r.getLong(6)) <= 1000000L)
  }
  test("q_wasserstein_1d: naive cumulative-mass replay per source") {
    val rows = Tables.t(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        math.min(r.getString(1).split(" ", -1).length / 20, 9).toLong))
    val nn = rows.length.toLong
    val qb = rows.groupBy(_._2).map { case (b, v) => b -> v.length.toLong }
    val out = SparkEntry.queries("q_wasserstein_1d")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    rows.groupBy(_._1).foreach { case (src, ds) =>
      val n = ds.length.toLong
      val pk = ds.groupBy(_._2).map { case (b, v) => b -> v.length.toLong }
      var cumk = 0L; var cumkb = 0L; var num = 0L
      (0L to 9L).foreach { b =>
        cumk += pk.getOrElse(b, 0L); cumkb += qb.getOrElse(b, 0L)
        num += math.abs(cumk * nn - cumkb * n)
      }
      assert(out(src) == ((n, num * 1000000L / (n * nn))), s"w1 for $src")
    }
  }

  test("q_conformal_coverage: order-statistic threshold replay") {
    val rows = Tables.t(spark, dir, "documents")
      .select("doc_id", "n_chars", "text").collect()
      .map(r => (r.getLong(0),
        math.abs(r.getLong(1) - 6L * r.getString(2).split(" ", -1).length)))
    val cal = rows.filter(_._1 % 2 == 0).map(_._2).sorted
    val ev = rows.filter(_._1 % 2 == 1).map(_._2)
    val k = (9 * (cal.length + 1) + 9) / 10 // ceil(0.9 (n+1))
    val thr = cal(k - 1)
    val r = SparkEntry.queries("q_conformal_coverage")(spark, dir)
      .collect().head
    assert(r.getLong(0) == cal.length.toLong)
    assert(r.getLong(1) == k.toLong, "k_rank")
    assert(r.getLong(2) == thr, "threshold")
    assert(r.getLong(3) == ev.length.toLong)
    assert(r.getLong(4) == ev.count(_ <= thr).toLong)
    assert(r.getLong(5) == ev.count(_ <= thr).toLong * 1000000L / ev.length)
    // the split-conformal guarantee: finite-sample coverage near 90%
    assert(r.getLong(5) > 800000L)
  }
  test("q_pass_at_k: naive combinatorial-estimator replay") {
    val tasks = Tables.t(spark, dir, "events")
      .groupBy("user_id").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.expr(
            "CASE WHEN value >= 10.0 THEN 1 ELSE 0 END")).as("c"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val out = SparkEntry.queries("q_pass_at_k")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    Seq(1L, 5L, 10L).foreach { k =>
      val el = tasks.filter(_._1 >= k)
      val passes = el.map { case (n, c) =>
        var fail = 1.0
        (0L until k).foreach(i =>
          fail *= (n - c - i).toDouble / (n - i).toDouble)
        math.round((1.0 - fail) * 1000000000)
      }
      val (nT, mean) = out(k)
      assert(nT == el.length.toLong, s"n_tasks for k=$k")
      assert(mean == passes.sum / (el.length * 1000L), s"mean for k=$k")
      assert(mean >= 0L && mean <= 1000000L)
    }
    // pass@k is monotone nondecreasing in k on the common task set
    assert(out(1L)._2 <= out(5L)._2 + 1 && out(5L)._2 <= out(10L)._2 + 1)
  }
  test("q_neyman_allocation: exact moment replay, shares close to 1e6") {
    val rows = Tables.t(spark, dir, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val out = SparkEntry.queries("q_neyman_allocation")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    val nsigs = rows.groupBy(_._1).map { case (src, v) =>
      val xs = v.map(_._2)
      val n = xs.length.toLong
      val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      src -> BigDecimal(math.sqrt((n * sxx - sx * sx).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val tot = nsigs.values.sum
    nsigs.foreach { case (src, nsig) =>
      val (nh, sigD, alloc, share) = out(src)
      assert(nh == rows.count(_._1 == src).toLong)
      assert(math.abs(sigD - nsig.toDouble) < 1e-9)
      assert(alloc == math.round(nsig.toDouble * 1000 / tot.toDouble))
      assert(share == math.round(nsig.toDouble * 1000000 / tot.toDouble))
    }
    // rounding slack: shares must reconstruct the whole within 1 per
    // stratum, allocations within the budget similarly
    val shareSum = out.values.map(_._4).sum
    assert(math.abs(shareSum - 1000000L) <= out.size.toLong)
    val allocSum = out.values.map(_._3).sum
    assert(math.abs(allocSum - 1000L) <= out.size.toLong)
  }
  test("q_loo_influence: exact replay; influence identity sums to zero") {
    val rows = Tables.t(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
    val nn = rows.length.toLong; val ss = rows.map(_._2).sum
    val out = SparkEntry.queries("q_loo_influence")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (src, v) =>
      val nh = v.length.toLong; val sh = v.map(_._2).sum
      val r = out(src)
      assert(r.getLong(1) == nh && r.getLong(2) == sh)
      assert(r.getLong(3) == (ss - sh) * 1000000L / (nn - nh))
      val num = ss * nh - nn * sh
      assert(r.getInt(4) == num.sign.toInt)
      assert(r.getLong(5) == num.abs * 1000000L / (nn * (nn - nh)))
    }
    // signed deltas weighted by the removed mass balance near zero:
    // sum_h (N - n_h) * delta_h = 0 exactly in the rationals
    val signedNum = rows.groupBy(_._1).map { case (_, v) =>
      ss * v.length.toLong - nn * v.map(_._2).sum }.sum
    assert(signedNum == 0L, "LOO influence identity")
  }
  test("e_power_analysis: closed-form replay, monotone in baseline variance") {
    val evs = Tables.t(spark, dir, "events")
      .selectExpr("event_type", "value >= 10.0 AS s").collect()
      .map(r => (r.getString(0), r.getBoolean(1)))
    val out = SparkEntry.queries("e_power_analysis")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    evs.groupBy(_._1).foreach { case (et, v) =>
      val n = v.length.toLong; val conv = v.count(_._2).toLong
      val p1 = conv.toDouble / n.toDouble
      val p2 = math.min(p1 + 0.02, 1.0)
      val pbar = (p1 + p2) / 2.0
      val a = 1.959964 * math.sqrt(2.0 * pbar * (1.0 - pbar)) +
        0.841621 * math.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))
      val nReq = math.ceil(a * a / (0.02 * 0.02)).toLong
      val r = out(et)
      assert(r.getLong(1) == n && r.getLong(2) == conv)
      assert(r.getLong(3) == conv * 1000000L / n)
      assert(r.getLong(4) == nReq, s"n_req for $et")
      assert(r.getBoolean(5) == (n / 2 >= nReq))
    }
  }
  test("q_group_percentiles: naive order-statistic replay per source") {
    val rows = Tables.t(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
    val out = SparkEntry.queries("q_group_percentiles")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    rows.groupBy(_._1).foreach { case (src, v) =>
      val xs = v.map(_._2).sorted
      val n = xs.length
      def pick(num: Int, den: Int) = xs((num * n + den - 1) / den - 1)
      val (gn, p10, p50, p90) = out(src)
      assert(gn == n.toLong)
      assert(p10 == pick(1, 10), s"p10 $src")
      assert(p50 == pick(1, 2), s"p50 $src")
      assert(p90 == pick(9, 10), s"p90 $src")
      assert(p10 <= p50 && p50 <= p90)
    }
  }
  test("q_cv_kfold: folds partition the corpus; replayed assignment") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Tables.t(spark, dir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (java.lang.Long.parseLong(
        md5hex(s"cv:${r.getLong(0)}").take(4), 16) % 5, r.getLong(1)))
    val out = SparkEntry.queries("q_cv_kfold")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == rows.map(_._1).toSet)
    assert(out.values.map(_.getLong(1)).sum == rows.length.toLong)
    rows.groupBy(_._1).foreach { case (fold, v) =>
      val r = out(fold)
      assert(r.getLong(1) == v.length.toLong, s"n fold $fold")
      assert(r.getLong(2) == v.map(_._2).sum, s"sum fold $fold")
      assert(r.getLong(3) == v.map(_._2).sum * 1000000L / v.length)
    }
    val means = out.values.map(_.getLong(3))
    val ns = out.values.map(_.getLong(1))
    out.values.foreach { r =>
      assert(r.getLong(4) == means.max - means.min)
      assert(r.getLong(5) == ns.max - ns.min)
    }
  }
}

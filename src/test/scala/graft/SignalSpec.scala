package graft

/** Semantic pins for the signal-processing queries (the DuckDB oracle
  * already pins exact values; these assert the invariants that define
  * each operator, independent of fixture content).
  */
class SignalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("e_seasonal_decompose: additive identity, edge nulls, volume conserved") {
    val out = SparkEntry.queries("e_seasonal_decompose")(spark, dir)
      .orderBy("h").collect()
    assert(out.length > 30, "needs a multi-day hourly series")
    val total = Tables.t(spark, dir, "events").count()
    assert(out.map(_.getLong(1)).sum == total,
      "hourly bucket counts must conserve the event count")
    // exactly the first/last 12 rows lack the ±12 centered window
    out.zipWithIndex.foreach { case (r, i) =>
      val edge = i < 12 || i >= out.length - 12
      assert(r.isNullAt(3) == edge, s"trend null-ness wrong at row $i")
      assert(r.isNullAt(5) == edge, s"resid null-ness wrong at row $i")
    }
    // 25·y == trend + seasonal + resid wherever the window is complete
    out.filterNot(_.isNullAt(3)).foreach { r =>
      assert(25L * r.getLong(2) ==
        r.getLong(3) + r.getLong(4) + r.getLong(5),
        s"additive identity broken at ${r.get(0)}")
    }
  }

  test("e_cusum_changepoint: closed form equals the textbook recursion") {
    val out = SparkEntry.queries("e_cusum_changepoint")(spark, dir)
      .orderBy("h").collect()
    assert(out.nonEmpty)
    // nonnegativity is structural: S_t minus a min over a frame
    // CONTAINING t can't be negative
    assert(out.forall(r => r.getLong(3) >= 0 && r.getLong(4) >= 0))
    // replay the literal recursion C⁺_t = max(0, C⁺ + x·1e6 − μ)
    val n = out.length
    val totalX = out.map(_.getLong(1)).sum
    val target = totalX * 1000000L / n
    var cp = 0L; var cn = 0L
    out.foreach { r =>
      val dev = r.getLong(1) * 1000000L - target
      cp = math.max(0L, cp + dev)
      cn = math.max(0L, cn - dev)
      assert(r.getLong(3) == cp, s"C+ mismatch at ${r.get(0)}")
      assert(r.getLong(4) == cn, s"C- mismatch at ${r.get(0)}")
      assert((r.getInt(5) == 1) == (cp > 4 * target || cn > 4 * target))
    }
    // final prefix sum is the floor-division residue: 0 <= S_n < n
    assert(out.last.getLong(2) == totalX * 1000000L - n * target)
  }

  test("e_snaive_backtest: replay from the hourly series, first day excluded") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("e_snaive_backtest")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getInt(4))).sortBy(_._1)
    assert(out.nonEmpty)
    // replay: hourly sums on a DENSE calendar spine (absent hours are
    // explicit zeros), forecast = the value exactly 24h earlier
    val observed = Tables.t(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 1000000)
        .cast("long").as("y"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toMap
    val (lo, hi) = (observed.keys.min, observed.keys.max)
    val hourMs = 3600000L
    val hourly = (lo to hi by hourMs)
      .map(t => (new java.sql.Timestamp(t), observed.getOrElse(t, 0L)))
    val lagged = hourly.drop(24).zip(hourly.dropRight(24))
      .map { case ((h, y), (_, f)) => (h.toLocalDateTime.toLocalDate.toString, y, f) }
    val want = lagged.groupBy(_._1).map { case (day, rs) =>
      val apes = rs.filter(_._2 > 0).map(r => math.abs(r._2 - r._3) * 10000 / r._2)
      val diff = rs.map(r => r._3 - r._2).sum
      (day, rs.length.toLong, apes.sum / apes.length,
        math.abs(diff) * 10000 / rs.map(_._2).sum, diff.signum)
    }.toSeq.sortBy(_._1)
    assert(out.toSeq === want)
    // the first observed day can't have a 24-back forecast for all its
    // hours; it must not appear fully
    val firstDay = hourly.head._1.toLocalDateTime.toLocalDate.toString
    assert(!out.exists(r => r._1 == firstDay && r._2 == 24L))
  }

  test("e_late_arrivals: late path exercised, counts conserved, lateness bounded") {
    val out = SparkEntry.queries("e_late_arrivals")(spark, dir).collect()
    val total = Tables.t(spark, dir, "events").count()
    assert(out.map(_.getLong(1)).sum == total)
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)))
    // max_late_sec present iff n_late > 0, and bounded by the jitter
    // span (an event can trail the watermark by at most jitter − delay
    // plus the trigger width)
    out.foreach { r =>
      assert(r.isNullAt(3) == (r.getLong(2) == 0))
      if (!r.isNullAt(3))
        assert(r.getLong(3) > 0 && r.getLong(3) < 900)
    }
    assert(out.map(_.getLong(2)).sum > 0,
      "fixture + jitter must actually produce late events " +
        "(a vacuous audit proves nothing)")
  }

  test("e_holt_winters: keyed fold bit-equal to a local replay") {
    val rows = Tables.t(spark, dir, "events")
      .selectExpr("event_type", "date_trunc('hour', ts)", "1")
      .collect().map(r => (r.getString(0), r.getTimestamp(1)))
      .groupBy(identity).map { case ((et, h), v) => (et, h, v.size.toLong) }
      .toSeq
    val out = SparkEntry.queries("e_holt_winters")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getTimestamp(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    import graft.operators.HoltWinters._
    val m = Period
    var checked = 0
    rows.groupBy(_._1).foreach { case (et, series) =>
      val xs = series.sortBy(_._2.getTime)
      if (xs.length >= 2 * m) {
        val s1 = xs.take(m).map(_._3).sum
        val s2 = xs.slice(m, 2 * m).map(_._3).sum
        var l = s1.toDouble / m.toDouble
        var b = (s2.toDouble - s1.toDouble) / (m.toDouble * m.toDouble)
        val ss = Array.tabulate(m)(i => xs(i)._3.toDouble - l)
        var t = m
        while (t < xs.length) {
          val x = xs(t)._3
          val sOld = ss(t % m)
          val f = l + b + sOld
          val lN = Alpha * (x.toDouble - sOld) + OneMinusAlpha * (l + b)
          val bN = Beta * (lN - l) + OneMinusBeta * b
          val sN = Gamma * (x.toDouble - lN) + OneMinusGamma * sOld
          ss(t % m) = sN; l = lN; b = bN
          val got = out((et, xs(t)._2))
          def r6(v: Double) =
            BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble
          assert(got._1 == x && got._2 == r6(lN) && got._3 == r6(bN) &&
            got._4 == r6(sN) && got._5 == r6(f),
            s"$et t=$t: $got vs (${r6(lN)}, ${r6(bN)}, ${r6(sN)}, ${r6(f)})")
          checked += 1
          t += 1
        }
      }
    }
    assert(checked > 0, "no key had >= 2 seasons — vacuous")
    assert(out.size == checked, "engine emitted rows the replay didn't")
  }

  test("e_theil_sen: lower-median slope matches the naive local replay") {
    val out = SparkEntry.queries("e_theil_sen")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    assert(out.nonEmpty)
    val daily = Tables.t(spark, dir, "events")
      .selectExpr("event_type",
        "datediff(cast(ts as date), date '2024-01-01')", "1L")
      .collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(identity).map { case ((et, x), v) => (et, x, v.size.toLong) }
      .toSeq
    out.foreach { case (et, nDays, nPairs, slope, intercept) =>
      val series = daily.filter(_._1 == et).map(t => (t._2, t._3))
      assert(nDays == series.length)
      val slopes = (for {
        (x1, y1) <- series; (x2, y2) <- series if x1 < x2
      } yield (y2 - y1).toDouble / (x2 - x1).toDouble).sorted
      assert(nPairs == slopes.length)
      // lower-median ELEMENT, bit-equal (no interpolation anywhere)
      assert(slope == slopes((slopes.length + 1) / 2 - 1))
      val resid = series.map { case (x, y) => y - slope * x }.sorted
      assert(intercept == resid((resid.length + 1) / 2 - 1))
    }
  }
  test("e_burstiness: naive dense-spine Fano replay") {
    val evs = Tables.t(spark, dir, "events")
      .selectExpr("event_type",
        "unix_micros(date_trunc('hour', ts)) div 3600000000 AS he")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val h0 = evs.map(_._2).min; val h1 = evs.map(_._2).max
    val out = SparkEntry.queries("e_burstiness")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == evs.map(_._1).toSet)
    evs.groupBy(_._1).foreach { case (et, rows) =>
      val byH = rows.groupBy(_._2).map { case (h, v) => h -> v.length.toLong }
      val xs = (h0 to h1).map(h => byH.getOrElse(h, 0L))
      val hN = xs.length.toLong
      val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      val r = out(et)
      assert(r.getLong(1) == hN && r.getLong(2) == sx)
      assert(r.getLong(3) == sx * 1000000L / hN, s"mean for $et")
      val fano = math.round((hN.toDouble * sxx.toDouble -
        sx.toDouble * sx.toDouble) * 1000000 / (hN.toDouble * sx.toDouble))
      assert(r.getLong(4) == fano, s"fano for $et")
      // dispersion of a counting series is nonnegative
      assert(r.getLong(4) >= 0L)
    }
  }
  test("e_slo_burn: exact multiwindow replay, page implies both windows") {
    val hs = Tables.t(spark, dir, "events")
      .selectExpr("unix_micros(date_trunc('hour', ts)) div 3600000000 AS he",
        "event_type = 'error' AS e")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (h, v) => (h, v.length.toLong, v.count(_._2).toLong) }
    val out = SparkEntry.queries("e_slo_burn")(spark, dir)
      .orderBy("he").collect()
    assert(out.length == hs.length)
    out.zipWithIndex.foreach { case (r, i) =>
      val (h, tot, err) = hs(i)
      assert(r.getLong(0) == h && r.getLong(1) == tot && r.getLong(2) == err)
      assert(r.getLong(3) == err * 1000000L / tot)
      assert(r.getLong(4) == (err * 1000000L / tot) / 50L)
      val lo = math.max(0, i - 5)
      val e6 = hs.slice(lo, i + 1).map(_._3).sum
      val t6 = hs.slice(lo, i + 1).map(_._2).sum
      assert(r.getLong(5) == (e6 * 1000000L / t6) / 50L, s"burn6 at $h")
      assert(r.getBoolean(6) ==
        (r.getLong(4) >= 1440L && r.getLong(5) >= 600L))
    }
  }
  test("e_markov_eval: naive train/test replay of the argmax model") {
    val evs = Tables.t(spark, dir, "events")
      .selectExpr("user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime, r.getLong(3)))
    val pairs = evs.groupBy(_._1).toSeq.flatMap { case (u, v) =>
      v.sortBy(e => (e._3, e._4)).map(_._2).sliding(2)
        .filter(_.length == 2).map(w => (u, w(0), w(1)))
    }
    val train = pairs.filter(_._1 % 2 == 0)
    val test = pairs.filter(_._1 % 2 == 1)
    val model = train.groupBy(p => (p._2, p._3))
      .map { case (k, v) => k -> v.length.toLong }
      .groupBy(_._1._1).map { case (prev, m) =>
        prev -> m.toSeq.sortBy(x => (-x._2, x._1._2)).head._1._2 }
    val hits = test.count(p => model.get(p._2).contains(p._3))
    val r = SparkEntry.queries("e_markov_eval")(spark, dir)
      .collect().head
    assert(r.getLong(0) == train.length.toLong)
    assert(r.getLong(1) == test.length.toLong)
    assert(r.getLong(2) == hits.toLong)
    assert(r.getLong(3) == test.count(p => !model.contains(p._2)).toLong)
    assert(r.getLong(4) == hits.toLong * 1000000L / test.length)
  }
  test("e_intervention_analysis: naive segmented-OLS replay") {
    val cut = 473688L
    val hours = Tables.t(spark, dir, "events")
      .selectExpr("event_type", "CAST(ts AS LONG) div 3600 AS hb")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case (k, v) => (k._1, k._2, v.length.toLong) }
    val out = SparkEntry.queries("e_intervention_analysis")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    hours.groupBy(_._1).foreach { case (et, bins) =>
      def fit(sel: Seq[(Long, Long)]): (Long, Double, Double, Long) = {
        val x0 = sel.map(_._1).min
        val n = sel.length.toLong
        val sx = sel.map(_._1 - x0).sum
        val sy = sel.map(_._2).sum
        val sxy = sel.map(b => (b._1 - x0) * b._2).sum
        val sxx = sel.map(b => (b._1 - x0) * (b._1 - x0)).sum
        val slope = (n.toDouble * sxy.toDouble - sx.toDouble * sy) /
          (n.toDouble * sxx.toDouble - sx.toDouble * sx)
        val icept = (sy.toDouble - slope * sx) / n
        (n, slope, icept, x0)
      }
      val series = bins.map(b => (b._2, b._3)).toSeq
      val (nPre, sPre, iPre, x0Pre) = fit(series.filter(_._1 < cut))
      val (nPost, sPost, iPost, x0Post) = fit(series.filter(_._1 >= cut))
      val lvlPre = iPre + sPre * (cut.toDouble - x0Pre.toDouble)
      val lvlPost = iPost + sPost * (cut.toDouble - x0Post.toDouble)
      val r = out(et)
      assert(r.getLong(1) == nPre && r.getLong(2) == nPost)
      assert(math.abs(r.getDouble(3) - sPre) < 1e-6, s"slope_pre $et")
      assert(math.abs(r.getDouble(4) - sPost) < 1e-6, s"slope_post $et")
      assert(math.abs(r.getDouble(8) - (lvlPost - lvlPre)) < 1e-5,
        s"level_shift $et")
    }
  }
}

package graft

/** Semantic pins for the preference / annotation-QA queries: the
  * DuckDB oracle replays the same construction SQL-side; these replay
  * it NAIVELY on the driver (plain Scala collections, exact integer
  * arithmetic) so the distributed shapes — the stride pairing join,
  * the BT fixed-point loop, the triad joins — are checked against an
  * independent implementation, not just a second engine's SQL.
  */
class PreferenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** (doc_id, source, tokenCount) replayed locally. */
  private lazy val docs: Vector[(Long, String, Long)] =
    Tables.t(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).length.toLong))
      .toVector.sortBy(_._1)

  /** The stride matches → (winner, loser) wins matrix, naive. */
  private lazy val wins: Map[(String, String), Long] = {
    val n = docs.length.toLong
    val byId = docs.map(d => d._1 -> d).toMap
    val pairs = for {
      a <- docs
      st <- Seq(1L, 3L, 4L, 7L)
      b = byId((a._1 + st) % n)
      if a._2 != b._2
    } yield {
      val aWins = a._3 > b._3 || (a._3 == b._3 && a._1 < b._1)
      if (aWins) (a._2, b._2) else (b._2, a._2)
    }
    pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  }

  private lazy val majorityEdges: Set[(String, String)] =
    wins.keySet.flatMap { case (x, y) =>
      val net = wins.getOrElse((x, y), 0L) - wins.getOrElse((y, x), 0L)
      if (net > 0L) Some((x, y)) else None
    }

  test("p_bradley_terry: exact replay of the 5-round MM fixed point") {
    val games = (wins.toSeq.map { case ((w, l), c) => ((w, l), c) } ++
      wins.toSeq.map { case ((w, l), c) => ((l, w), c) })
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val verts = games.keySet.map(_._1).toVector.sorted
    val wn = verts.map(v =>
      v -> wins.collect { case ((w, _), c) if w == v => c }.sum).toMap
    var p = verts.map(v => v -> 1000000L).toMap
    for (_ <- 1 to 5) {
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
    val out = SparkEntry.queries("p_bradley_terry")(spark, dir)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == verts.toSet)
    verts.foreach { v =>
      val (g, w, bt) = out(v)
      assert(g == games.collect { case ((i, _), c) if i == v => c }.sum)
      assert(w == wn(v), s"wins mismatch for $v")
      assert(bt == p(v), s"bt_e6 mismatch for $v: engine $bt naive ${p(v)}")
    }
  }

  test("p_cohen_kappa: exact replay of the 2x2 agreement table") {
    val nChars = Tables.t(spark, dir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bySrc = docs.groupBy(_._2)
    val out = SparkEntry.queries("p_cohen_kappa")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == bySrc.keySet)
    bySrc.foreach { case (src, ds) =>
      val flags = ds.map(d => (d._3 >= 55L, nChars(d._1) >= 300L))
      val n = flags.size.toLong
      val n11 = flags.count(f => f._1 && f._2).toLong
      val n00 = flags.count(f => !f._1 && !f._2).toLong
      val a1 = flags.count(_._1).toLong
      val b1 = flags.count(_._2).toLong
      val chance = a1 * b1 + (n - a1) * (n - b1)
      val num = n * (n11 + n00) - chance
      val den = n * n - chance
      val r = out(src)
      assert(r.getLong(1) == n && r.getLong(2) == n11 &&
        r.getLong(3) == n00)
      assert(r.getLong(4) == (n11 + n00) * 1000000L / n)
      assert(r.getInt(5) == num.sign.toInt)
      assert(r.getLong(6) ==
        (if (den > 0L) num.abs * 1000000L / den else 0L))
    }
  }

  test("p_triad_census: naive triple walk over the majority digraph") {
    val e = majorityEdges
    val verts = e.flatMap(p => Seq(p._1, p._2)).toVector.sorted
    val decided = (for {
      i <- verts.indices; j <- (i + 1) until verts.size
      k <- (j + 1) until verts.size
      a = verts(i); b = verts(j); c = verts(k)
      if (e((a, b)) || e((b, a))) && (e((a, c)) || e((c, a))) &&
        (e((b, c)) || e((c, b)))
    } yield {
      // cyclic iff not transitive iff no vertex beats both others
      val cyc = !Seq(a, b, c).exists(v =>
        Seq(a, b, c).filter(_ != v).forall(u => e((v, u))))
      cyc
    }).toVector
    val r = SparkEntry.queries("p_triad_census")(spark, dir)
      .collect().head
    assert(r.getLong(0) == e.size.toLong, "n_edges")
    assert(r.getLong(1) == decided.size.toLong, "n_triads")
    assert(r.getLong(2) == decided.count(identity).toLong, "n_cyclic")
    assert(r.getLong(3) == decided.count(!_).toLong, "n_transitive")
    assert(r.getLong(4) == (if (decided.nonEmpty)
      decided.count(identity).toLong * 1000000L / decided.size else 0L))
  }

  test("p_fleiss_kappa: exact replay of the 3-rater category table") {
    val rows = Tables.t(spark, dir, "documents")
      .select("source", "text", "n_chars").collect()
    val bySrc = rows.groupBy(_.getString(0))
    val out = SparkEntry.queries("p_fleiss_kappa")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == bySrc.keySet)
    bySrc.foreach { case (src, ds) =>
      val nij = ds.map { d =>
        val toks = d.getString(1).split(" ", -1)
        val tc = toks.length.toLong
        val dt = toks.distinct.length.toLong
        val r1 = if (tc < 40) 0 else if (tc < 70) 1 else 2
        val r2 = if (d.getLong(2) < 250) 0
                 else if (d.getLong(2) < 450) 1 else 2
        val r3 = if (dt * 10 < tc * 7) 0
                 else if (dt * 10 < tc * 9) 1 else 2
        val n = Array(0L, 0L, 0L)
        Seq(r1, r2, r3).foreach(j => n(j) += 1)
        n
      }
      val nI = nij.length.toLong
      val sq = nij.map(n => n.map(x => x * x).sum).sum
      val c = Array(0, 1, 2).map(j => nij.map(_(j)).sum)
      val sNum = sq - nI * 3
      val csq = c.map(x => x * x).sum
      val num = sNum * nI * 3 - 2 * csq
      val den = 2 * (nI * 3 * nI * 3 - csq)
      val r = out(src)
      assert(r.getLong(1) == nI && r.getLong(2) == c(0) &&
        r.getLong(3) == c(1) && r.getLong(4) == c(2))
      assert(r.getLong(5) == sNum * 1000000L / (nI * 6))
      assert(r.getInt(6) == num.sign.toInt)
      assert(r.getLong(7) ==
        (if (den > 0) num.abs * 1000000L / den else 0L))
    }
  }

  test("p_copeland_borda: degrees of the replayed majority digraph") {
    val e = majorityEdges
    val bordaW = wins.groupBy(_._1._1).map { case (k, v) =>
      k -> v.values.sum }
    val out = SparkEntry.queries("p_copeland_borda")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val verts = wins.keySet.flatMap(p => Seq(p._1, p._2))
    assert(out.keySet == verts)
    verts.foreach { v =>
      val r = out(v)
      assert(r.getLong(1) == e.count(_._1 == v).toLong, s"maj_wins $v")
      assert(r.getLong(2) == e.count(_._2 == v).toLong, s"maj_losses $v")
      assert(r.getLong(3) == bordaW.getOrElse(v, 0L), s"borda $v")
      assert(r.getLong(4) == r.getLong(1) - r.getLong(2))
    }
    // ranks order by (score desc, source asc) — source-unique, so the
    // dense rank equals 1 + #strictly-preceding sources
    val rows = out.values.toSeq
    rows.foreach { r =>
      val (v, net, bor) = (r.getString(0), r.getLong(4), r.getLong(3))
      assert(r.getInt(5) == 1 + rows.count(o => o.getLong(4) > net ||
        (o.getLong(4) == net && o.getString(0) < v)), s"cope rank $v")
      assert(r.getInt(6) == 1 + rows.count(o => o.getLong(3) > bor ||
        (o.getLong(3) == bor && o.getString(0) < v)), s"borda rank $v")
    }
  }

  test("p_js_divergence: bounded, near-nonnegative, sum identity") {
    val out = SparkEntry.queries("p_js_divergence")(spark, dir).collect()
    val srcs = docs.map(_._2).distinct
    assert(out.length == srcs.size)
    val ln2x2e12 = 1386294361120L // 2·ln2·1e12, the JS upper bound
    out.foreach { r =>
      val (p, q, js) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(js == p + q, "2JS must be the sum of its KL halves")
      // Gibbs: each KL half >= 0 up to the 1e-12 per-term rounding
      // residue (<= #buckets ulps)
      assert(p >= -20L && q >= -20L, s"KL residue too negative: $p $q")
      assert(js <= ln2x2e12 + 20L, "JS exceeds ln 2")
    }
  }
}

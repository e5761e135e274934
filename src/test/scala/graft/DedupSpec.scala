package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("exactGroups: representative is min id, multiplicity counted") {
    val g = Dedup.exactGroups(
      docs((1L, "a b c"), (5L, "a b c"), (3L, "x y z")), "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(g === Map(1L -> 2L, 3L -> 1L))
  }

  test("jaccardPairs: identical docs have jaccard 1.0; disjoint docs absent") {
    val d = docs(
      (1L, "a b c d e f"), (2L, "a b c d e f"),
      (3L, "p q r s t u"))
    val pairs = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("jaccardPairs dfCap drops ubiquitous shingles") {
    // shared shingle "a b c" appears in all 3 docs → capped out at dfCap=2
    val d = docs(
      (1L, "a b c x1 y1"), (2L, "a b c x2 y2"), (3L, "a b c x3 y3"))
    val noPairs = Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.1, dfCap = Some(2))
    assert(noPairs.collect().isEmpty)
    val withPairs = Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.1, dfCap = None)
    assert(withPairs.count() === 3)
  }

  test("jaccardPairsPrefix equals the exact inverted-index result on real docs") {
    // equality against jaccardPairs proves the prefix filter admits no
    // false negatives (and the verify step no false positives) on a
    // corpus with genuine near-duplicates
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val near = d.union(d.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" tail token")).as("text")))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e12))).toSet
    val exact = canon(Dedup.jaccardPairs(near, "doc_id", "text",
      n = 5, threshold = 0.4, dfCap = None))
    val prefix = canon(Dedup.jaccardPairsPrefix(near, "doc_id", "text",
      n = 5, threshold = 0.4))
    assert(exact.nonEmpty)
    assert(prefix === exact)
  }

  test("jaccardPairsPrefix: boilerplate-heavy shingles stay out of prefixes") {
    // all docs share a ubiquitous header; rare distinguishing tokens
    // drive candidates, so identical bodies still pair at 1.0 body overlap
    val d = docs(
      (1L, "common header words everywhere here alpha beta gamma delta one"),
      (2L, "common header words everywhere here alpha beta gamma delta one"),
      (3L, "common header words everywhere here zz yy xx ww vv"))
    val got = Dedup.jaccardPairsPrefix(d, "doc_id", "text", n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("containmentPairs is asymmetric: subset side scores 1.0, superset side less") {
    // doc 2 = strict prefix of doc 1 → every 3-shingle of 2 is in 1:
    // C(2→1) = 1.0 (4 of 4); C(1→2) = 4/6; disjoint doc 3 absent
    val d = docs(
      (1L, "a b c d e f g h"), (2L, "a b c d e f"),
      (3L, "p q r s t u"))
    val got = Dedup.containmentPairs(d, "doc_id", "text", n = 3,
        threshold = 0.0, dfCap = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((2L, 1L)) === 1.0)
    assert(math.abs(got((1L, 2L)) - 4.0 / 6.0) < 1e-12)
    assert(!got.keySet.exists(k => k._1 == 3L || k._2 == 3L))
    // thresholding keeps only the subset direction
    val strict = Dedup.containmentPairs(d, "doc_id", "text", 3, 0.9,
        dfCap = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(strict.toSeq === Seq((2L, 1L)))
  }

  test("containmentPairsPrefix equals the exact inverted-index result") {
    // subject-side prefix + size prune must admit no false negatives:
    // equality against containmentPairs on a corpus with genuine
    // subset/near-dup structure (originals + truncated variants)
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val tok = graft.functions.Text.tokens(col("text"))
    val corpus = d.union(d.select((col("doc_id") + 100000).as("doc_id"),
      array_join(slice(tok, lit(2), size(tok) - 1), " ").as("text")))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e12))).toSet
    Seq(0.5, 0.9).foreach { t =>
      val exact = canon(Dedup.containmentPairs(corpus, "doc_id", "text",
        n = 5, threshold = t, dfCap = None))
      val prefix = canon(Dedup.containmentPairsPrefix(corpus, "doc_id",
        "text", n = 5, threshold = t))
      assert(exact.nonEmpty)
      assert(prefix === exact, s"threshold $t")
    }
  }

  test("minhash LSH finds near-dups and skips distant docs") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val d = docs(
      (1L, base), (2L, base + " w13"), // high overlap
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"))
    val pairs = Dedup.minhashLshPairs(d, "doc_id", "text",
      n = 3, bands = 3, rowsPerBand = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("simhash: deterministic, near-identical token sets within small hamming") {
    val a = Dedup.simhashHex(Seq("alpha", "beta", "gamma", "delta", "epsilon"))
    val b = Dedup.simhashHex(Seq("alpha", "beta", "gamma", "delta", "epsilon"))
    assert(a === b && a.length === 16)
    val c = Dedup.simhashHex(Seq("alpha", "beta", "gamma", "delta", "zeta"))
    assert(Dedup.hammingHex(a, c) < Dedup.hammingHex(a,
      Dedup.simhashHex(Seq("one", "two", "three", "four", "five"))))
  }

  test("simhashPairs: exact copies at distance 0 via quarter blocking") {
    val d = docs(
      (1L, "m1 m2 m3 m4 m5 m6"), (2L, "m1 m2 m3 m4 m5 m6"),
      (3L, "q1 q2 q3 q4 q5 q6"))
    val pairs = Dedup.simhashPairs(d, "doc_id", "text", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 0)))
  }

  test("dupClusters: chain transitivity, disjoint components, min label") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3) plus separate pair 10-11: labels must
    // propagate across hops the pair list never states directly
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a_id", "b_id")
    val got = graft.operators.Dedup.dupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("dupClusters: string ids converge (no numeric-sum assumption)") {
    import spark.implicits._
    val pairs = Seq(("docA", "docB"), ("docB", "docC"), ("x", "y"))
      .toDF("a_id", "b_id")
    val got = graft.operators.Dedup.dupClusters(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("docA" -> "docA", "docB" -> "docA",
      "docC" -> "docA", "x" -> "x", "y" -> "x"))
    // a component deeper than maxIter must throw, not mislabel
    val chain = (1L to 12L).sliding(2).map(w => (w(0), w(1))).toSeq
      .toDF("a_id", "b_id")
    intercept[IllegalStateException] {
      graft.operators.Dedup.dupClusters(chain, maxIter = 3)
    }
  }

  test("clusterRepresentatives: best score wins, ties to min id") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster")
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 2L), (11L, 2L))
      .toDF("doc_id", "quality")
    val got = graft.operators.Dedup.clusterRepresentatives(
        labels, docs, "doc_id", org.apache.spark.sql.functions.col("quality"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // cluster 1: docs 2 and 3 tie at 9 → min id 2; cluster 10: tie → 10
    assert(got === Map(1L -> (2L, 9L), 10L -> (10L, 2L)))
  }

  test("jaccardPairsAgainst: new-vs-base only, base-frequency stoplist") {
    import spark.implicits._
    // base docs 1 and 2 consist of ONE shared 5-gram (df=2)
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "alpha beta gamma delta epsilon"), // dup of base 1 and 2
      (11L, "totally different words here now ok")).toDF("doc_id", "text")
    val got = graft.operators.Dedup.jaccardPairsAgainst(
        fresh, base, "doc_id", "text", n = 5, threshold = 0.5, dfCap = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 1L), (10L, 2L))) // new-vs-base only
    // a cap of 1 stops the boilerplate shingle (df=2 in the base):
    // the dup has no remaining shingle to be matched through
    val capped = graft.operators.Dedup.jaccardPairsAgainst(
        fresh, base, "doc_id", "text", n = 5, threshold = 0.5,
        dfCap = Some(1))
      .collect()
    assert(capped.isEmpty)
  }

  test("dupSpanStats: cross-doc spans only, interval union exact") {
    val d = docs(
      (1L, "a b c d e f"),   // "a b c" shared with doc 2 → tokens 1-3
      (2L, "x a b c y z"),   // same 3-gram at p=2 → tokens 2-4
      (3L, "q w e r t y"),   // nothing shared → 0
      (4L, "a b c d e"),     // "a b c"+"b c d" shared with 5 → union 1-4
      (5L, "a b c d z"))     // (overlapping intervals must not double-count)
    val got = Dedup.dupSpanStats(d, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    // docs 1/4/5 all share "a b c"; 1 also shares "b c d"/"c d e" with 4
    assert(got(3L) === ((6, 0L)))
    assert(got(2L) === ((6, 3L)))
    assert(got(4L) === ((5, 5L)))   // "a b c","b c d","c d e" → 1..5
    assert(got(1L) === ((6, 5L)))   // same three 3-grams → 1..5, not 6
    assert(got(5L) === ((5, 4L)))   // "a b c","b c d" → 1..4
  }

  test("dupSpanScrub: covered tokens removed, order kept, short docs intact") {
    val d = docs(
      (1L, "a b c d e f"),
      (2L, "x a b c y z"),
      (3L, "a b"))           // < n tokens: no n-grams, untouched
    val got = Dedup.dupSpanScrub(d, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("d e f", 3L, 3L)))
    assert(got(2L) === (("x y z", 3L, 3L)))
    assert(got(3L) === (("a b", 2L, 0L)))
  }

  test("dupSpanStats/Scrub match a brute-force model on random corpora") {
    // seeded random corpora over a tiny vocabulary (high n-gram
    // collision rate) vs an independent in-memory model: dup set =
    // n-grams in >= 2 distinct docs; covered = union of [p, p+n-1]
    val rnd = new scala.util.Random(421)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for (_ <- 1 to 3) {
      val n = 3
      val corpus = (1L to 20L).map { id =>
        val len = 5 + rnd.nextInt(26)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val grams = toks.view.mapValues(ts =>
        ts.sliding(n).zipWithIndex
          .map { case (g, i) => (i + 1, g.mkString(" ")) }.toSeq).toMap
      val dup = grams.toSeq.flatMap { case (id, gs) =>
        gs.map(g => (g._2, id)) }.groupBy(_._1)
        .filter(_._2.map(_._2).distinct.length >= 2).keySet
      val expected = toks.map { case (id, ts) =>
        val covered = grams(id).filter(g => dup(g._2))
          .flatMap { case (p, _) => p until p + n }.toSet
        id -> ((ts.length, covered.size.toLong,
          ts.zipWithIndex.collect {
            case (t, i) if !covered(i + 1) => t }.mkString(" ")))
      }
      val df = docs(corpus: _*)
      val stats = Dedup.dupSpanStats(df, "doc_id", "text", n)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
      val scrub = Dedup.dupSpanScrub(df, "doc_id", "text", n)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      expected.foreach { case (id, (nTok, nCov, clean)) =>
        assert(stats(id) === ((nTok, nCov)), s"stats doc $id")
        assert(scrub(id) === clean, s"scrub doc $id")
      }
    }
  }

  test("span stats and scrub agree on every doc (union = anti-join count)") {
    // two independent exact algorithms for the covered-token count:
    // the lead()-window interval union and the explode/distinct/
    // anti-join grid. They must agree document-by-document.
    import spark.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val corpus = base.union(base.select(($"doc_id" + 500000).as("doc_id"),
      concat_ws(" ", $"text", lit("tail marker")).as("text")))
    val stats = Dedup.dupSpanStats(corpus, "doc_id", "text", n = 8)
      .select($"doc_id", $"n_dup_tokens".as("a"))
    val scrub = Dedup.dupSpanScrub(corpus, "doc_id", "text", n = 8)
      .select($"doc_id", $"n_removed".as("b"))
    val disagree = stats.join(scrub, "doc_id").filter($"a" =!= $"b").count()
    assert(disagree === 0L)
    // and the corpus genuinely exercises both paths
    assert(stats.filter($"a" > 0).count() > 0)
  }

  test("d_softdedup: copies fully shared, commonness strictly negative") {
    import spark.implicits._
    val rows = graft.queries.DedupQueries.queries("d_softdedup")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (logc, frac) = (r.getDouble(2), r.getDouble(3))
      // every 5-gram df is in [1, n_docs) on this corpus → ln < 0
      assert(logc < 0.0, s"doc ${r.getLong(0)}: logc=$logc")
      assert(frac >= 0.0 && frac <= 1.0)
    }
    // a drop-1-token copy's distinct 5-grams are a subset of its
    // original's, so every one of them has df >= 2: shared_frac == 1
    val copies = rows.filter(_.getLong(0) >= 100000L)
    assert(copies.nonEmpty)
    copies.foreach { r =>
      assert(r.getDouble(3) === 1.0,
        s"copy ${r.getLong(0)}: shared_frac=${r.getDouble(3)}")
    }
    // and the copy can never have MORE distinct 5-grams than its original
    val byId = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    copies.foreach { r =>
      val orig = r.getLong(0) - 100000L
      byId.get(orig).foreach(n => assert(r.getLong(1) <= n))
    }
  }

  test("winnowing guarantee: a shared run of >= w+k-1 tokens always pairs") {
    import spark.implicits._
    // k=3, w=4: guarantee threshold is 6 shared consecutive tokens.
    // Two docs share exactly the 6-token run "p q r s t u" inside
    // otherwise-disjoint text; a third doc is fully disjoint.
    val docs = Seq(
      (1L, "a1 a2 p q r s t u a3 a4"),
      (2L, "b1 p q r s t u b2 b3 b4"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8")
    ).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.winnowPairs(docs, "doc_id",
        graft.functions.Text.tokens(col("text")),
        k = 3, w = 4, dfCap = 20, minShared = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      s"expected exactly the planted pair, got $pairs")
    assert(pairs.head._3 >= 1)
  }

  test("winnowFingerprints: density, bounds, and sub-window-length cases") {
    import spark.implicits._
    val r = Seq(
      ("x " * 200).trim,   // 200 identical tokens -> 1 distinct kgram hash
      "a b c",             // 1 kgram < w windows -> empty
      "a b"                // no kgram at all -> empty
    ).toDF("text")
      .select(graft.operators.Dedup.winnowFingerprints(
        split(col("text"), " "), 3, 4).as("fps"))
      .as[Seq[Long]].collect()
    assert(r(0).length == 1, "constant text collapses to one fingerprint")
    assert(r(1).isEmpty && r(2).isEmpty)
    // density: the sequence t_{(i*7919) mod 97} has period 97, so there
    // are only 97 distinct kgrams; window-min selection keeps a strict,
    // non-trivial subset of them (sub-full-density, not degenerate)
    val dense = Seq.tabulate(300)(i => s"t${(i * 7919) % 97}").mkString(" ")
    val n = Seq(dense).toDF("text")
      .select(graft.operators.Dedup.winnowFingerprints(
        split(col("text"), " "), 3, 4).as("fps"))
      .as[Seq[Long]].head().length
    assert(n > 10 && n < 97, s"fingerprint density off: $n of 97 distinct kgrams")
  }

  test("d_record_linkage: every planted typo twin is recovered (full recall)") {
    val out = SparkEntry.queries("d_record_linkage")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val planted = Tables.t(spark, "/root/testdata/sf0.001", "customer")
      .filter(col("c_custkey") % 7 === 0).count()
    val twins = out.filter { case (a, b, _) => b - a == 1000000L && a % 7 == 0 }
    assert(twins.length == planted.toInt,
      s"recovered ${twins.length} of $planted planted twins")
    // the typo is a single substitution — lev must be exactly 1
    twins.foreach { case (_, _, lev) => assert(lev == 1) }
    // candidate discipline: every emitted pair really is lev <= 2
    out.foreach { case (_, _, lev) => assert(lev >= 0 && lev <= 2) }
  }

  test("cdcChunks: spans partition the doc, contiguous indices") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h i j k l m n o p q r s t"),
      (2L, "xy"), (3L, "one two")).toDF("doc_id", "text")
    val got = Dedup.cdcChunks(docs, "doc_id", "text", k = 3, divisor = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(4)))
    got.groupBy(_._1).foreach { case (id, rows) =>
      val n = rows.head._2
      assert(rows.map(_._4).sum == n, s"doc $id: chunk lens must sum to n")
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
        s"doc $id: chunk_idx must be contiguous from 1")
    }
    // sub-k docs are a single whole-doc chunk
    assert(got.filter(_._1 == 2L).map(x => (x._3, x._4)).toSeq == Seq((1, 1)))
    assert(got.filter(_._1 == 3L).map(x => (x._3, x._4)).toSeq == Seq((1, 2)))
  }

  test("cdcChunks: a front insertion re-synchronizes within one chunk") {
    import spark.implicits._
    // 60 deterministic pseudo-words; B = A with one token prepended.
    // Every boundary of A at position p reappears in B at p+1 (the
    // 3-gram ending there is unchanged), so ALL of A's chunks except
    // the first must reappear verbatim in B's chunk stream.
    val words = (1 to 60).map(i => s"w${i * 7 % 101}")
    val a = words.mkString(" ")
    val b = ("zzz" +: words).mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val ch = Dedup.cdcChunks(docs, "doc_id", "text", k = 3, divisor = 8)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    val ha = ch.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val hb = ch.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSet
    assert(ha.length > 2, "fixture must produce several chunks")
    assert(ha.drop(1).forall(hb.contains),
      "all of A's chunks after the first must survive the insertion")
  }
  test("d_dedup_threshold_curve: monotone in t, anchored at the 0.5 pairs") {
    val sfd = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("d_dedup_threshold_curve")(spark, sfd)
      .orderBy("threshold_pct").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == Seq(50L, 60L, 70L, 80L, 90L))
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2, "pair count must not increase with t")
      assert(a._3 >= b._3, "doc count must not increase with t")
    }
    val anchor = SparkEntry.queries("d_jaccard_pairs")(spark, sfd).count()
    assert(out.head._2 == anchor,
      "t=50 must count exactly the d_jaccard_pairs threshold-0.5 pairs")
    out.foreach { case (_, p, d) =>
      assert(d <= 2 * p, "a pair touches at most 2 docs")
      assert(p == 0 || d >= 2, "any pair touches at least 2 docs")
    }
  }

  test("d_dup_inflation: naive replay of the double-delivery fold") {
    val sfd = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, sfd, "documents")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val d = docs ++ docs.filter(_._2 % 3 == 0)
    val out = SparkEntry.queries("d_dup_inflation")(spark, sfd)
      .collect().map(r => r.getString(0) -> r).toMap
    d.groupBy(_._1).foreach { case (src, rows) =>
      val byText = rows.groupBy(_._3)
      val nDocs = rows.length.toLong
      val nDist = byText.size.toLong
      val toks = byText.toSeq.map { case (tx, v) =>
        (tx.split(" ", -1).length.toLong, v.length.toLong) }
      val total = toks.map { case (t, k) => t * k }.sum
      val dist = toks.map(_._1).sum
      val r = out(src)
      assert(r.getLong(1) == nDocs && r.getLong(2) == nDist)
      assert(r.getLong(3) == total && r.getLong(4) == dist)
      assert(r.getLong(5) == total * 1000000L / dist, s"ppm for $src")
    }
  }
  test("d_ngram_dup_curve: naive type census, monotone in n") {
    val sfd = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, sfd, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getString(1).split(" ", -1).toSeq)
    val out = SparkEntry.queries("d_ngram_dup_curve")(spark, sfd)
      .orderBy("n").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(5L, 10L, 20L))
    out.foreach { r =>
      val n = r.getLong(0).toInt
      val perDoc = docs.map(t => t.sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSet)
      val counts = perDoc.flatten.groupBy(identity)
        .map { case (_, v) => v.length.toLong }
      assert(r.getLong(1) == counts.size.toLong, s"types at n=$n")
      assert(r.getLong(2) == counts.count(_ >= 2L).toLong, s"dups at n=$n")
      assert(r.getLong(3) == counts.filter(_ >= 2L).sum, s"occ at n=$n")
      assert(r.getLong(4) == r.getLong(2) * 1000000L / r.getLong(1))
    }
    // NOTE: dup TYPE share is not monotone in n (the type universe
    // shrinks with n too) — only the exact replay above is invariant.
  }
  test("d_lsh_design: S-curve replay, monotone in s, threshold brackets") {
    val out = SparkEntry.queries("d_lsh_design")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.length == 36)
    out.foreach { case (b, r, k, ppm, _) =>
      val s = k / 10.0
      val want = 1.0 - math.pow(1.0 - math.pow(s, r.toDouble), b.toDouble)
      // integer floor vs closed form: within one ppm
      assert(math.abs(ppm - want * 1e6) <= 1.0, s"(b=$b,r=$r,s=$s)")
      assert(b * r == 16L, "all configs share the signature budget")
    }
    // P(s) is nondecreasing in s (strictness saturates at the ppm
    // floor once P ≈ 1 for aggressive configs)
    out.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      rows.sortBy(_._3).map(_._4).sliding(2).foreach {
        case Array(a, c) => assert(a <= c); case _ => }
    }
    // s* threshold: P(s) crosses ~1/2 near s_star (bracket by a grid step)
    out.groupBy(t => (t._1, t._2)).foreach { case (key, rows) =>
      val sStar = rows.head._5 / 1e6
      rows.sortBy(_._3).foreach { case (_, _, k, ppm, _) =>
        if (k / 10.0 < sStar - 0.1) assert(ppm < 500000L, s"$key below")
        if (k / 10.0 > sStar + 0.1) assert(ppm > 500000L, s"$key above")
      }
    }
  }
  test("d_minhash_bbit: estimator identity and error bounded on exact copies") {
    val out = SparkEntry.queries("d_minhash_bbit")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    out.foreach { case (_, _, j, est, err) =>
      assert(est >= 0L && est <= 1000000L)
      assert(err == math.abs(est - j), "error identity")
      // est granularity is 1/16 of full scale (k=32, est = (2m-32)/32)
      assert(est % 62500L == 0L, "estimates live on the k-grid")
    }
    // identical bit signatures => est exactly 1.0 when j = 1.0
    out.filter(_._3 == 1000000L).foreach { case (a, b, _, est, _) =>
      assert(est == 1000000L, s"exact copy ($a,$b) must estimate 1.0")
    }
    // the estimator is unbiased-ish: mean error under 25% of scale on
    // this high-similarity pair population
    val meanErr = out.map(_._5).sum / out.length
    assert(meanErr < 250000L, s"mean |err| $meanErr too large")
  }

  test("updateClusters: incremental == full recompute, bridges merge clusters") {
    import spark.implicits._
    // old graph: two separate clusters {1,2,3} and {10,11}, plus {20,21}
    val oldEdges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("a_id", "b_id")
    val oldLabels = Dedup.dupClusters(oldEdges)
    // new batch: 100 joins cluster {1,2,3}; 101 BRIDGES {10,11} and
    // {20,21} (the merge case that must relabel an old cluster whose
    // edges are never re-read); 102-103 form a new-only cluster
    val newEdges = Seq((100L, 3L), (101L, 11L), (101L, 20L),
      (102L, 103L)).toDF("a_id", "b_id")
    val got = Dedup.updateClusters(oldLabels, newEdges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.dupClusters(oldEdges.unionByName(newEdges))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === full)
    // the bridge really merged: 10,11,20,21,101 all share min id 10
    assert(Seq(10L, 11L, 20L, 21L, 101L)
      .forall(i => got.contains((i, 10L))))
    // random stress: 40 old nodes, 25 random old edges; 10 new nodes,
    // 15 random incident edges — seeded, incremental == full
    val rnd = new scala.util.Random(13)
    val oe = Seq.fill(25)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2).toDF("a_id", "b_id")
    val ne = Seq.fill(15) {
      val n = (100 + rnd.nextInt(10)).toLong
      val other = if (rnd.nextBoolean()) rnd.nextInt(40).toLong
                  else (100 + rnd.nextInt(10)).toLong
      (n, other)
    }.filter(p => p._1 != p._2).toDF("a_id", "b_id")
    val incr = Dedup.updateClusters(Dedup.dupClusters(oe), ne)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val whole = Dedup.dupClusters(oe.unionByName(ne))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incr === whole)
  }

  test("d_edit_pairs: naive replay — brute force within blocks, mutants found") {
    // replay the d_edit_pairs pipeline by hand on a tiny corpus: the
    // blocked path must equal brute-force Levenshtein over all pairs
    // RESTRICTED to the (first-4-chars, length) block key, and every
    // single-substitution mutant must surface with ld == 1
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(
        j => if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val texts = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta iotas",
      3L -> "omega psi chi phi upsilon tau sigma rho pi")
    def mutate(t: String) = t.take(9) + "q" + t.slice(10, 64)
    val all = texts.map { case (id, t) => (id, t.take(64)) } ++
      texts.map { case (id, t) => (id + 100000L, mutate(t)) }
    def key(p: String) = (p.take(4), p.length)
    val expected = (for {
      (ia, pa) <- all; (ib, pb) <- all
      if ia < ib && key(pa) == key(pb) && lev(pa, pb) <= 3
    } yield (ia, ib, lev(pa, pb))).toSet
    // run the SAME blocked pipeline the query uses, on this corpus
    val corpus = all.toDF("id", "p")
    val keyed = corpus.withColumn("k1", substring(col("p"), 1, 4))
      .withColumn("kl", length(col("p")))
    val got = keyed.as("a").join(keyed.as("b"),
        col("a.k1") === col("b.k1") && col("a.kl") === col("b.kl") &&
        col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.p"), col("b.p")).as("ld"))
      .filter(col("ld") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === expected)
    // every mutant pairs with its original at distance exactly 1
    texts.foreach { case (id, _) =>
      assert(got.contains((id, id + 100000L, 1)), s"mutant of $id missing")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Paths

/** Property-based laws from SURVEY.md §5 (raw ScalaCheck generators,
  * fixed seeds for reproducibility): prefix idempotence of the path
  * rewrites and the semi ∪ anti partition law.
  */
class PropertySpec extends SparkSpec {

  private val seg = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val relPath = Gen.nonEmptyListOf(seg).map(_.take(4).mkString("/"))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("O10 is idempotent: normalize(normalize(p)) == normalize(p)") {
    import spark.implicits._
    (1L to 10L).foreach { s =>
      val paths = sample(Gen.listOfN(20, relPath), s)
      val df = paths.toDF("p")
      val once = df.select(Paths.normalizeWithPrefix(col("p"), "raw/").as("p"))
      val twice = once.select(Paths.normalizeWithPrefix(col("p"), "raw/").as("p"))
      assert(once.collect().map(_.getString(0)).toSeq ===
        twice.collect().map(_.getString(0)).toSeq)
    }
  }

  test("O12 output always lives under the target prefix, no double slash") {
    import spark.implicits._
    (1L to 10L).foreach { s =>
      val paths = sample(Gen.listOfN(20, relPath), 100 + s)
      val out = paths.toDF("p")
        .select(Paths.rewriteRelocate(col("p"), "raw/", "/tgt/").as("p"))
        .collect().map(_.getString(0))
      assert(out.forall(_.startsWith("/tgt/")))
      assert(out.forall(!_.contains("//")))
    }
  }

  test("partition law: semi ∪ anti == manifest (disjoint)") {
    import spark.implicits._
    (1L to 10L).foreach { s =>
      val manifest = sample(Gen.listOfN(30, Gen.chooseNum(0L, 50L)), 200 + s).distinct
      val listing  = sample(Gen.listOfN(30, Gen.chooseNum(0L, 50L)), 300 + s).distinct
      val m = manifest.toDF("k")
      val l = listing.toDF("k")
      val semi = m.join(l, Seq("k"), "left_semi").collect().map(_.getLong(0)).toSet
      val anti = m.join(l, Seq("k"), "left_anti").collect().map(_.getLong(0)).toSet
      assert((semi intersect anti).isEmpty)
      assert((semi union anti) === manifest.toSet)
    }
  }

  test("as-of join == brute-force nearest-preceding on random event sets") {
    import spark.implicits._
    import java.sql.Timestamp
    (1L to 5L).foreach { s =>
      // random (id, user, second-offset) with collisions across users
      val rows = sample(Gen.listOfN(60,
        Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 5000L))), 400 + s)
        .zipWithIndex.map { case ((u, sec), i) =>
          (i.toLong, new Timestamp(1700000000000L + sec * 1000), u)
        }
      val (lrows, rrows0) = rows.splitAt(30)
      // the operator requires (key, ts) unique on the RIGHT — dedupe
      // the generated rows the way a caller would
      val rrows = rrows0.groupBy(r => (r._3, r._2)).values.map(_.head).toSeq
      val left = lrows.toDF("event_id", "ts", "user_id")
      val right = rrows.toDF("event_id", "ts", "user_id")
      val got = graft.operators.AsOf.asOfJoin(left, right, Seq("user_id"),
          "ts", leftCols = Seq("event_id"), rightCols = Seq("event_id"))
        .collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("m_event_id")).map(_.toLong)).toMap
      // brute force: the unique right row of the same user with the
      // latest at-or-before timestamp
      val expected = lrows.map { case (lid, lts, lu) =>
        val c = rrows.filter { case (_, rts, ru) =>
          ru == lu && !rts.after(lts) }
        lid -> (if (c.isEmpty) None
                else Some(c.maxBy { case (_, rts, _) => rts.getTime }._1))
      }.toMap
      assert(got === expected, s"seed ${400 + s}")
    }
  }

  test("TopK aggregate == window row_number on random skewed data") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    (1L to 5L).foreach { s =>
      // heavy skew: most rows land in group 0
      val rows = sample(Gen.listOfN(200, Gen.zip(
        Gen.frequency(5 -> Gen.const(0L), 1 -> Gen.chooseNum(1L, 6L)),
        Gen.chooseNum(-100, 100))), 500 + s)
        .zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v.toDouble) }
      val df = rows.toDF("g", "id", "score").repartition(5)
      val agg = graft.operators.TopK.perGroup(df, col("g"), col("score"),
          col("id"), 4).select("g", "rk", "id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val w = Window.partitionBy("g")
        .orderBy(col("score").desc, col("id").asc)
      val win = df.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 4).select("g", "rk", "id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(agg === win, s"seed ${500 + s}")
    }
  }

  test("HeavyHitters == naive groupBy-count on random long-tail data") {
    import spark.implicits._
    (1L to 5L).foreach { s =>
      val items = sample(Gen.listOfN(400, Gen.frequency(
        3 -> Gen.oneOf("hot1", "hot2"),
        1 -> Gen.chooseNum(0, 500).map(i => s"cold$i"))), 600 + s)
      val df = items.toDF("item").repartition(7)
      val got = graft.operators.HeavyHitters.frequentItems(df, col("item"),
          minCount = 10, capacity = 64, validate = true)
        .as[(String, Long)].collect().toSet
      val naive = df.groupBy("item").count().filter(col("count") >= 10)
        .as[(String, Long)].collect().toSet
      assert(got === naive, s"seed ${600 + s}")
    }
  }

  test("exactQuantiles(q) is order-stat correct on random data") {
    import spark.implicits._
    (1L to 5L).foreach { s =>
      val vals = sample(Gen.listOfN(101, Gen.chooseNum(-1000, 1000)), 700 + s)
        .map(_.toDouble)
      val got = graft.operators.Profile
        .exactQuantiles(vals.toDF("v").repartition(4), "v", Seq(0.0, 0.5, 1.0))
        .as[(Double, Double)].collect().toMap
      val sorted = vals.sorted
      assert(got(0.0) === sorted.head, s"seed ${700 + s}")
      assert(got(0.5) === sorted(50), s"seed ${700 + s}") // n=101 → exact mid
      assert(got(1.0) === sorted.last, s"seed ${700 + s}")
    }
  }

  test("skyline2d equals the quadratic dominance definition on random points") {
    import spark.implicits._
    (1L to 5L).foreach { s =>
      // small integer domain on purpose: dense duplicate prices/sizes
      // stress the strictness edge cases
      val pts = sample(Gen.listOfN(60,
        Gen.zip(Gen.chooseNum(0, 9), Gen.chooseNum(0, 9))), 800 + s)
        .zipWithIndex.map { case ((p, q), i) => (i.toLong, p.toDouble, q) }
      val got = graft.operators.Frontier
        .skyline2d(pts.toDF("id", "price", "size").repartition(5),
          "price", "size")
        .select("id").as[Long].collect().toSet
      val naive = pts.filter { case (_, p, q) =>
        !pts.exists { case (_, p2, q2) =>
          (p2 < p && q2 >= q) || (p2 <= p && q2 > q) }
      }.map(_._1).toSet
      assert(got === naive, s"seed ${800 + s}")
    }
  }

  test("triangleStats equals brute-force triple enumeration on random graphs") {
    import spark.implicits._
    (1L to 5L).foreach { s =>
      // ~12 vertices, directed duplicates and self-loops allowed on
      // input — the operator must normalize before counting
      val raw = sample(Gen.listOfN(50,
        Gen.zip(Gen.chooseNum(0L, 11L), Gen.chooseNum(0L, 11L))), 900 + s)
      val got = graft.operators.Graph
        .triangleStats(raw.toDF("src", "dst").repartition(3))
        .as[(Long, Long, Long)].collect().head
      val und = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.toSet
      val nodes = und.flatMap(e => Set(e._1, e._2))
      val tris = nodes.toSeq.combinations(3).count { c =>
        val Seq(a, b, cc) = c.sorted
        und((a, b)) && und((b, cc)) && und((a, cc))
      }
      assert(got === ((nodes.size.toLong, und.size.toLong, tris.toLong)),
        s"seed ${900 + s}")
    }
  }

  test("SCD-2 intervals tile each user's history: chained, typed, current-open") {
    // invariants on the real events table at the smallest SF: per user
    // the intervals chain exactly (valid_to == next valid_from), types
    // never repeat consecutively, exactly one open current interval
    val rows = SparkEntry.queries("e_scd2_intervals")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, iv) =>
      val sorted = iv.sortBy(_._3.getTime)
      sorted.sliding(2).foreach {
        case Array((_, t1, _, to1), (_, t2, f2, _)) =>
          assert(to1.contains(f2), s"user $u: gap or overlap")
          assert(t1 != t2, s"user $u: uncompressed run")
        case _ =>
      }
      assert(sorted.init.forall(_._4.isDefined) && sorted.last._4.isEmpty,
        s"user $u: exactly the last interval must be open")
    }
  }

  test("binary probes never throw on arbitrary bytes (fuzz)") {
    import spark.implicits._
    import graft.operators.Multimodal
    // random payloads 0..64 bytes, plus adversarial prefixes: right
    // magic with truncated bodies for every format
    val rnd = new scala.util.Random(42L)
    val random = (1 to 200).map(_ =>
      Array.fill(rnd.nextInt(65))(rnd.nextInt(256).toByte))
    val magics = Seq("89504E47", "474946383961", "424D", "494433",
      "52494646", "FFD8", "FFD8FFC0", "0000001066747970",
      "66747970", "000000086D6F6F76",
      // EXIF adversarial prefixes: bare APP1, preamble-only, TIFF
      // header with an IFD offset pointing past the segment
      "FFD8FFE1", "FFD8FFE10008457869660000",
      "FFD8FFE10012457869660000" + "4D4D002A" + "000000FF")
      .map(h => h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
    val df = (random ++ magics).zipWithIndex
      .map { case (b, i) => (i.toLong, b) }.toDF("id", "content")
    val (isPng, pw, ph) = Multimodal.pngDims(col("content"))
    val (isGif, gw, gh) = Multimodal.gifDims(col("content"))
    val (isBmp, bw, bh) = Multimodal.bmpDims(col("content"))
    val (isId3, ver, tsz) = Multimodal.id3Meta(col("content"))
    val (isWav, ch, sr, bits) = Multimodal.wavMeta(col("content"))
    val jpeg = graft.expressions.ImageExprs.jpegDims(col("content"))
    val exif = graft.expressions.ImageExprs.exifOrientation(col("content"))
    val mp4 = graft.expressions.MediaExprs.mp4Meta(col("content"))
    // the only assertion that matters: every probe evaluates every row
    // without throwing — junk classifies as false/null, never an error
    val n = df.select(col("id"), isPng, pw, ph, isGif, gw, gh,
        isBmp, bw, bh, isId3, ver, tsz, isWav, ch, sr, bits,
        jpeg.getField("width"), exif, mp4.getField("duration"))
      .collect().length
    assert(n === random.length + magics.length)
  }

  test("lastmod parsing never throws; status total on arbitrary strings (fuzz)") {
    import spark.implicits._
    // random strings plus adversarial near-W3C forms: the parse must
    // yield (ts, has_time) without erroring (ANSI mode is on — a bare
    // to_date/to_timestamp would throw), and recrawl classification
    // must stay total over every (lastmod, fetched_at) combination
    val rnd = new scala.util.Random(7L)
    val junk = (1 to 200).map { _ =>
      val len = rnd.nextInt(30)
      (1 to len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    }
    val nearMiss = Seq("2024", "2024-1-5", "2024-13-40",
      "2024-01-05T", "2024-01-05T25:00:00Z", "2024-01-05 17:00:00",
      "2024-01-05T17:00:00+25:00", "T17:00:00Z", "99999-01-01",
      "2024-01-05T17:00:00.123456789+00:00", "-2024-01-05", "")
    val entries = (junk ++ nearMiss).zipWithIndex
      .map { case (lm, i) => (s"https://ex.org/f/$i", lm) }
      .toDF("url", "lastmod")
    val log = Seq(("https://ex.org/f/1", "2024-01-15 09:00:00"))
      .toDF("url", "fetched_at")
      .select(col("url"), col("fetched_at").cast("timestamp")
        .as("fetched_at"))
    val got = graft.sources.Sitemaps.recrawlPlan(entries, log)
      .collect()
    assert(got.length === junk.length + nearMiss.length)
    // every row classified into exactly the four statuses
    assert(got.forall(r => Set("new", "stale", "fresh", "unknown")
      .contains(r.getAs[String]("status"))))
    // a well-formed fractional+offset form still parses (not junk)
    val frac = got.find(_.getString(0).endsWith(
      s"/f/${junk.length + 9}")).get // the .123456789+00:00 row
    assert(frac.getAs[Boolean]("lastmod_has_time"))
  }

  test("prefix-filtered Jaccard == exact inverted index on random corpora") {
    import spark.implicits._
    // small alphabet forces heavy shingle sharing (the prefix filter's
    // hard case: many candidates, many ties in the global df order)
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")
    val doc = Gen.listOfN(12, word).map(_.mkString(" "))
    (1L to 5L).foreach { s =>
      val docs = sample(Gen.listOfN(30, doc), 400 + s)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(1),
          math.rint(r.getDouble(2) * 1e12))).toSet
      // 0.07 and 0.15 are the double-rounding hazards: t·|X| can land
      // one ulp above an integer (0.07 × 100 → 7.000000000000001), so
      // a double-arithmetic ceil would shorten the prefix — the exact
      // decimal bound must not
      Seq(0.07, 0.15, 0.3, 0.5, 0.8).foreach { t =>
        val exact = canon(graft.operators.Dedup.jaccardPairs(
          df, "doc_id", "text", n = 3, threshold = t, dfCap = None))
        val prefix = canon(graft.operators.Dedup.jaccardPairsPrefix(
          df, "doc_id", "text", n = 3, threshold = t))
        assert(prefix === exact, s"seed $s threshold $t")
      }
    }
  }

  test("prefix bound is exact at double-rounding boundaries (t·|X| integral)") {
    import spark.implicits._
    // |A| = 100 unigram shingles, |B| = 7, B ⊂ A, threshold 0.07:
    // J(A,B) = 7/100 = 0.07 exactly, so the pair must be emitted. In
    // double arithmetic 0.07·100 = 7.000000000000001, so BOTH exactness
    // hazards fire: the ceil shortens A's prefix past the one shared
    // low-df region, and the length filter rejects |B| = 7 <
    // 7.000000000000001. The exact-decimal bound accepts both.
    val shared = (1 to 7).map(i => f"s$i%03d")
    val aOnly = (1 to 93).map(i => f"w$i%03d")
    val d = Seq(
      (1L, (aOnly ++ shared).mkString(" ")),
      (2L, shared.mkString(" "))).toDF("doc_id", "text")
    val got = graft.operators.Dedup.jaccardPairsPrefix(
      d, "doc_id", "text", n = 1, threshold = 0.07).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq === Seq((1L, 2L, 0.07)))
  }

  test("graft_nfc: idempotent and Normalizer-equal over messy unicode") {
    import spark.implicits._
    // generator mixes plain ASCII runs, combining marks (acute 0x301,
    // diaeresis 0x308, cedilla 0x327), precomposed latin-1 letters,
    // and NFC-singleton codepoints (ANGSTROM 0x212b, OHM 0x2126)
    val piece = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("\u0301", "\u0308", "\u0327"),
      Gen.oneOf("\u00e9", "\u00c5", "\u00fc"),
      Gen.oneOf("\u212b", "\u2126"))
    val messy = Gen.listOfN(8, piece).map(_.mkString)
    (1L to 10L).foreach { s =>
      val rows = sample(Gen.listOfN(30, messy), 400 + s)
      val df = rows.toDF("s")
      val once = df.select(
        graft.expressions.TextExprs.nfc(col("s")).as("n"))
      val got = once.collect().map(_.getString(0)).toSeq
      // idempotence: a second pass is the identity
      val twice = once.select(
          graft.expressions.TextExprs.nfc(col("n")).as("n"))
        .collect().map(_.getString(0)).toSeq
      assert(got === twice)
      // and the codegen'd result equals the JDK reference directly
      val want = rows.map(java.text.Normalizer.normalize(_,
        java.text.Normalizer.Form.NFC))
      assert(got === want)
    }
  }

  test("skip-gram pairs == brute-force window replay on random docs") {
    import spark.implicits._
    val tok = Gen.oneOf("a", "b", "c", "", "dd", "e")
    val doc = Gen.listOfN(7, tok).map(_.mkString(" "))
    (1L to 10L).foreach { s =>
      val docs = sample(Gen.listOfN(15, doc), 500 + s)
      val w = 3
      val got = graft.operators.Mining
        .skipgramPairs(docs.toDF("text"), split(col("text"), " "), w)
        .collect().map(r => (r.getString(0), r.getString(1)))
        .sorted.toSeq
      // brute force: for each offset 1..w pair token i with i+off,
      // dropping pairs touching an empty token
      val want = docs.flatMap { d =>
        val t = d.split(" ", -1)
        for {
          off <- 1 to w
          i <- 0 until math.max(t.length - off, 0)
          if t(i).nonEmpty && t(i + off).nonEmpty
        } yield (t(i), t(i + off))
      }.sorted.toSeq
      assert(got === want)
    }
  }

  test("kmeans assignment is the true argmin on random points") {
    import spark.implicits._
    val coord = Gen.chooseNum(-5.0, 5.0).map(x => math.rint(x * 100) / 100)
    val vec = Gen.listOfN(4, coord).map(_.map(_.toFloat))
    (1L to 5L).foreach { s =>
      val pts = sample(Gen.listOfN(25, vec), 600 + s)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val model = sample(Gen.listOfN(3, vec), 700 + s)
        .zipWithIndex.map { case (v, i) => i -> v.map(_.toDouble) }.toMap
      val got = graft.operators.KMeans
        .assignTo(pts.toDF("vec_id", "embedding"), model)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      pts.foreach { case (id, v) =>
        val want = model.toSeq.map { case (cid, c) =>
          (v.map(_.toDouble).zip(c).map { case (a, b) =>
            (a - b) * (a - b) }.sum, cid)
        }.min._2
        assert(got(id) == want, s"point $id: got ${got(id)}, want $want")
      }
    }
  }

  test("AVI render->demux round-trips frames and sums on random shapes") {
    import graft.operators.Multimodal
    val shape = for {
      id <- Gen.chooseNum(0L, 1000000L)
      w <- Gen.oneOf(4, 8, 12, 16) // w*3 DWORD-aligned -> no row padding
      h <- Gen.chooseNum(1, 12)
      n <- Gen.chooseNum(1, 5)
    } yield (id, w, h, n)
    (1L to 20L).foreach { s =>
      val (id, w, h, n) = sample(shape, 800 + s)
      val avi = Multimodal.renderAviRaw(id, w, h, n)
      assert(Multimodal.aviDims(avi) === Some((w, h, 24, 0)))
      val frames = Multimodal.demuxAvi(avi)
      assert(frames.map(_._1) == (0 until n).toSeq)
      frames.foreach { case (f, kind, payload) =>
        assert(kind == "db" && payload.length == w * h * 3)
        val want = 3L * (0 until w * h)
          .map(p => ((id * 31 + f * 7 + p) % 256 + 256) % 256).sum
        assert(payload.map(b => (b & 0xFF).toLong).sum == want,
          s"id=$id w=$w h=$h frame=$f")
      }
    }
  }

  test("funnel stages == greedy first-qualifying fold on random event logs") {
    import spark.implicits._
    val horizonUs = 86400L * 1000000L
    val ev = for {
      user <- Gen.chooseNum(0L, 5L)
      // spread beyond the 24h horizon so the window clause really bites
      us <- Gen.chooseNum(0L, 3L * horizonUs)
      typ <- Gen.oneOf("signup", "click", "purchase", "view")
    } yield (user, us, typ)
    def refStages(events: Seq[(Long, Long, String)]): Map[Long, Int] =
      events.groupBy(_._1).flatMap { case (u, es) =>
        var (sUs, cUs, pUs) = (-1L, -1L, -1L)
        es.sortBy(_._2).foreach { case (_, us, typ) =>
          typ match {
            case "signup" if sUs < 0 => sUs = us
            case "click" if sUs >= 0 && cUs < 0 &&
                us > sUs && us <= sUs + horizonUs => cUs = us
            case "purchase" if cUs >= 0 && pUs < 0 &&
                us > cUs && us <= cUs + horizonUs => pUs = us
            case _ => ()
          }
        }
        if (sUs < 0) None
        else Some(u -> (if (pUs >= 0) 3 else if (cUs >= 0) 2 else 1))
      }
    (1L to 10L).foreach { s =>
      val events = sample(Gen.listOfN(60, ev), 900 + s)
      val df = events.zipWithIndex
        .map { case ((u, us, typ), i) => (i.toLong, us, u, typ) }
        .toDF("event_id", "us", "user_id", "event_type")
        .withColumn("ts", expr("timestamp_micros(us)"))
      val got = graft.operators.Funnel.stages(df)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === refStages(events), s"seed ${900 + s}")
    }
  }

  test("markov transitions == brute-force per-user bigram replay") {
    import spark.implicits._
    val ev = for {
      user <- Gen.chooseNum(0L, 4L)
      us <- Gen.chooseNum(0L, 100000L)
      typ <- Gen.oneOf("a", "b", "c")
    } yield (user, us, typ)
    def ref(events: Seq[(Long, Long, String)]): Map[(String, String), (Long, Long)] = {
      // events sorted by (ts, event_id) per user — event_id is the
      // original index, matching the engine's tiebreak
      val pairs = events.zipWithIndex.groupBy(_._1._1).toSeq.flatMap {
        case (_, es) =>
          es.sortBy { case ((_, us, _), i) => (us, i) }
            .map(_._1._3).sliding(2).collect {
              case Seq(p, n) => (p, n)
            }
      }
      val cnt = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val marg = cnt.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
      cnt.map { case ((p, n), c) => (p, n) -> (c, c * 1000000L / marg(p)) }
    }
    (1L to 8L).foreach { s =>
      val events = sample(Gen.listOfN(80, ev), 1700 + s)
      val df = events.zipWithIndex
        .map { case ((u, us, typ), i) => (i.toLong, us, u, typ) }
        .toDF("event_id", "us", "user_id", "event_type")
        .withColumn("ts", expr("timestamp_micros(us)"))
      df.createOrReplaceTempView("markov_tmp")
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val pairs = df
        .withColumn("prev", lag(col("event_type"), 1).over(byUser))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("n"))
      val marg = pairs.groupBy("prev").agg(sum(col("n")).as("tot"))
      val got = pairs.join(marg, "prev")
        .select(col("prev"), col("next"), col("n"),
          expr("n * 1000000 div tot").as("p_ppm"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(got === ref(events), s"seed ${1700 + s}")
    }
  }

  test("CDC law: spans partition the doc; a random insertion loses <= 3 chunks") {
    import spark.implicits._
    val word = Gen.choose(0, 40).map(i => s"w$i")
    (1L to 8L).foreach { s =>
      val toks = sample(Gen.listOfN(80, word), 2500 + s)
      val pos = sample(Gen.choose(0, toks.length), 2600 + s)
      val a = toks.mkString(" ")
      val b = (toks.take(pos) ++ List("INS") ++ toks.drop(pos)).mkString(" ")
      val ch = graft.operators.Dedup.cdcChunks(
          Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
          "doc_id", "text", k = 3, divisor = 8)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
          r.getInt(4)))
      // spans partition each doc, indices contiguous from 1
      Seq(1L, 2L).foreach { id =>
        val rows = ch.filter(_._1 == id)
        assert(rows.map(_._5).sum == rows.head._2, s"seed $s doc $id")
        assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
          s"seed $s doc $id")
      }
      // local boundaries: only the chunks overlapping the insertion
      // neighborhood can change — everything else re-synchronizes.
      // Multiset difference A \ B is at most 3 chunks (the chunk
      // containing the insertion plus a possibly split/merged
      // neighbor on each side).
      val ha = ch.filter(_._1 == 1L).map(_._4).toSeq
      val hb = scala.collection.mutable.Buffer(
        ch.filter(_._1 == 2L).map(_._4).toSeq: _*)
      val lost = ha.count { h =>
        val i = hb.indexOf(h)
        if (i >= 0) { hb.remove(i); false } else true
      }
      assert(lost <= 3, s"seed $s: $lost of ${ha.length} chunks lost")
    }
  }

  test("mutual k-NN law: engine edges == brute-force reciprocal top-k in-bucket") {
    import spark.implicits._
    val comp = Gen.choose(-100, 100).map(_ / 100.0)
    (1L to 6L).foreach { s =>
      val vecs = (0 until 24).map { i =>
        (i.toLong, sample(Gen.listOfN(6, comp), 3000 + 31 * s + i).toSeq)
      }.filter(_._2.exists(_ != 0.0))
      val k = 3; val bits = 2
      def bucket(v: Seq[Double]) =
        v.take(bits).map(x => if (x >= 0) "1" else "0").mkString
      def cos(a: Seq[Double], b: Seq[Double]) = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        d / (math.sqrt(a.map(x => x * x).sum) *
          math.sqrt(b.map(x => x * x).sum))
      }
      val topk = vecs.map { case (id, v) =>
        id -> vecs.filter(o => o._1 != id && bucket(o._2) == bucket(v))
          .map(o => (cos(v, o._2), o._1))
          .sortBy { case (c, oid) => (-c, oid) }.take(k).map(_._2).toSet
      }.toMap
      // iterate a Seq, not the Map — a for/yield over Map collapses
      // duplicate keys (one mutual edge per src would survive)
      val want = (for {
        (a, na) <- topk.toSeq; b <- na
        if a < b && topk(b).contains(a)
      } yield (a, b)).toSet
      val got = graft.operators.Similarity.knnGraphMutual(
          vecs.toDF("vec_id", "embedding"), k = k, bits = bits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"seed $s")
    }
  }
}

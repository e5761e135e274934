package graft

import graft.operators.Bpe

/** Distributed BPE learner vs a single-threaded reference
  * implementation of the same (public) algorithm. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE: brute-force pair counting over an in-memory
    * (word → freq) map, same tiebreak (count desc, pair asc). */
  private def referenceMerges(words: Map[String, Long],
                              n: Int): Seq[(String, String)] = {
    var syms: Map[Seq[String], Long] =
      words.map { case (w, f) => Bpe.codePoints(w) -> f }
    val out = Seq.newBuilder[(String, String)]
    for (_ <- 1 to n) {
      val counts = syms.toSeq.flatMap { case (s, f) =>
        s.zip(s.drop(1)).map(p => p -> f)
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.nonEmpty) {
        val ((a, b), _) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((a, b))
        syms = syms.toSeq.map { case (s, f) => Bpe.mergeSeq(s, a, b) -> f }
          .groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.result()
  }

  // includes a non-BMP (surrogate-pair) word: code-point splitting must
  // keep 😀 one symbol or Spark's UTF-8 round-trip mangles it to '?'
  private val corpus = Map(
    "low" -> 5L, "lower" -> 2L, "lowest" -> 6L,
    "newest" -> 3L, "widest" -> 2L, "nice" -> 1L,
    "😀😀a" -> 4L)

  test("learnMerges matches the reference algorithm, any partitioning") {
    val want = referenceMerges(corpus, 8)
    for (parts <- Seq(1, 4)) {
      val df = corpus.toSeq.toDF("word", "freq").repartition(parts)
      assert(Bpe.learnMerges(df, 8) === want, s"partitions=$parts")
    }
  }

  test("segment applies merges in order; exhausted corpus stops early") {
    val merges = Bpe.learnMerges(corpus.toSeq.toDF("word", "freq"), 8)
    // "lowest" must segment into fewer symbols than characters
    val seg = Bpe.segment("lowest", merges)
    assert(seg.mkString === "lowest" && seg.length < 6)
    // a single-char vocab exhausts pairs and returns fewer merges
    val tiny = Bpe.learnMerges(Seq(("ab", 1L)).toDF("word", "freq"), 10)
    assert(tiny === Seq(("a", "b")))
  }

  test("encodeExpr (column fold) == segment (scan) incl. repeat/chain cases") {
    import org.apache.spark.sql.functions.col
    val merges = Seq(("a", "a"), ("aa", "b"), ("b", "c"), ("t", "h"))
    // aaaa: non-overlap left-to-right; aab: chained merge of a merged
    // symbol; abcbc: merge that skips; empty-ish single chars pass through
    val words = Seq("aaaa", "aab", "aabaab", "abcbc", "x", "thth", "a")
    val got = words.toDF("w")
      .select(col("w"), Bpe.encodeExpr(col("w"), merges).as("e"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    words.foreach { w =>
      assert(got(w) === Bpe.segment(w, merges).toList, s"word $w")
    }
  }
}

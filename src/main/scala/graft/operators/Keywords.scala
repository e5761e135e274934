package graft.operators

import scala.collection.mutable

/** Multi-pattern keyword matching (Aho-Corasick) — the blocklist /
  * topic-tagging primitive of a corpus-curation pipeline: K dictionary
  * terms counted in ONE pass over each document, instead of K
  * per-pattern scans (the naive shape is O(K·|corpus|) — at 100 TB and
  * a 10k-term blocklist that is four orders of magnitude more text
  * traversal than the automaton's O(|corpus| + matches)).
  *
  * The reference's selection stage is single-predicate
  * (app/main.py:138-143 name-contains filters); this generalizes that
  * to dictionary scale the way production crawl filters
  * (FlashText/Aho-Corasick) do.
  *
  * Scale shape: the automaton is built from a plan-literal pattern
  * array ONCE per executor (lazy, ~40 bytes/node) and the corpus
  * streams through map-side — no shuffle, no join, no UDF encoder
  * round trip (native expression [[graft.expressions.MultiMatchCounts]]
  * evaluates over the raw UTF8String). Matches are counted at EVERY
  * position (overlapping occurrences included, the standard automaton
  * semantics) so the result is a pure function of (text, pattern) —
  * replayable in SQL by a position scan.
  */
object Keywords {

  /** Immutable Aho-Corasick automaton. Built once from the dictionary;
    * `countAll` returns per-pattern occurrence counts (all positions,
    * overlapping included; duplicate patterns each get their count).
    */
  final class Automaton private (
      next: Array[mutable.LongMap[Int]], // state -> (char -> state)
      fail: Array[Int],
      out: Array[Array[Int]], // state -> pattern indices ending here
      val nPatterns: Int) extends Serializable {

    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](nPatterns)
      if (text == null) return counts
      var state = 0
      var i = 0
      val n = text.length
      while (i < n) {
        val c = text.charAt(i).toLong
        var s = state
        while (s != 0 && !next(s).contains(c)) s = fail(s)
        state = next(s).getOrElse(c, 0)
        val hits = out(state)
        var j = 0
        while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
        i += 1
      }
      counts
    }
  }

  object Automaton {
    /** Build goto/fail/output tables. Empty patterns are rejected (an
      * empty needle would "match" at every position, which is never
      * what a blocklist means — fail loud at build, not at scan).
      */
    def apply(patterns: Seq[String]): Automaton = {
      require(patterns.nonEmpty, "empty dictionary")
      require(patterns.forall(p => p != null && p.nonEmpty),
        "null/empty pattern in dictionary")
      val next = mutable.ArrayBuffer(mutable.LongMap.empty[Int])
      val outB = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
      // trie
      patterns.zipWithIndex.foreach { case (p, idx) =>
        var s = 0
        var i = 0
        while (i < p.length) {
          val c = p.charAt(i).toLong
          s = next(s).getOrElse(c, {
            next += mutable.LongMap.empty[Int]
            outB += mutable.ArrayBuffer.empty[Int]
            val ns = next.length - 1
            next(s).update(c, ns)
            ns
          })
          i += 1
        }
        outB(s) += idx
      }
      // BFS fail links; output sets merge along the fail chain so a
      // state's `out` already contains every pattern that ends at it
      // through ANY suffix — the scan never walks the chain
      val fail = new Array[Int](next.length)
      val queue = mutable.Queue.empty[Int]
      next(0).foreach { case (_, s) => fail(s) = 0; queue += s }
      while (queue.nonEmpty) {
        val r = queue.dequeue()
        next(r).foreach { case (c, s) =>
          queue += s
          var f = fail(r)
          while (f != 0 && !next(f).contains(c)) f = fail(f)
          // depth invariant: f descends r's fail chain, so
          // depth(f) < depth(r), and next(f)(c) has depth ≤ depth(f)+1
          // ≤ depth(r) < depth(s) — the link can never self-loop.
          fail(s) = next(f).getOrElse(c, 0)
          outB(s) ++= outB(fail(s))
        }
      }
      new Automaton(next.map(m => m).toArray, fail,
        outB.map(_.toArray).toArray, patterns.length)
    }
  }
}

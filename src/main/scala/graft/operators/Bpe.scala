package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary learning.
  *
  * Classic BPE (Sennrich et al., public algorithm): start from
  * characters, repeatedly merge the most frequent adjacent symbol
  * pair. The distributed shape mirrors the original map-reduce BPE
  * trainers: the corpus collapses ONCE to a (word, freq) table (one
  * aggregation — at 100 TB the word table is orders of magnitude
  * smaller than the corpus and stays distributed), then each merge
  * round is
  *   1. one map-combinable pair-count aggregation weighted by freq,
  *   2. one TakeOrderedAndProject argmax (a single row to the driver —
  *      the only driver data per round),
  *   3. one distributed map applying the merge.
  * Ties break (count desc, pair asc) so the learned vocabulary is a
  * total function of the corpus — independent of partitioning.
  */
object Bpe {

  /** Split into code points, NOT UTF-16 code units: a lone surrogate
    * half is not a valid string, and Spark's UTF-8 encoding would
    * mangle it to '?' — conflating every non-BMP symbol. */
  private[graft] def codePoints(w: String): Seq[String] =
    w.codePoints().toArray.toSeq.map(cp => new String(Character.toChars(cp)))

  /** Merge all non-overlapping (a,b) occurrences left-to-right. */
  private[graft] def mergeSeq(s: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += s(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `nMerges` merges from a (word, freq) table. Returns the
    * ordered merge list — the BPE vocabulary artifact. */
  def learnMerges(words: DataFrame, nMerges: Int): Seq[(String, String)] = {
    val spark = words.sparkSession
    import spark.implicits._
    val Seq(wc, fc) = words.columns.take(2).toSeq
    var syms: Dataset[(Seq[String], Long)] = words
      .select(col(wc).cast("string"), col(fc).cast("long"))
      .as[(String, Long)]
      .map { case (w, f) => (codePoints(w), f) }
      .localCheckpoint(false)
    val merges = Seq.newBuilder[(String, String)]
    var rounds = 0
    var exhausted = false
    while (rounds < nMerges && !exhausted) {
      val top = syms.flatMap { case (s, f) =>
          if (s.length < 2) Iterator.empty
          else s.iterator.zip(s.iterator.drop(1)).map(p => (p._1, p._2, f))
        }.toDF("a", "b", "f")
        .groupBy("a", "b").agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        syms = syms.map { case (s, f) => (mergeSeq(s, a, b), f) }
          .localCheckpoint(false) // truncate the per-round lineage
        // stale rounds' checkpoint blocks are reclaimed by the
        // ContextCleaner once the previous Dataset is unreachable —
        // Dataset.unpersist would NOT release them (it only clears
        // CacheManager entries from persist()/cache()), and manually
        // dropping the RDD blocks would break the not-yet-materialized
        // lazy checkpoint of the round that reads them
        rounds += 1
      }
    }
    merges.result()
  }

  /** Segment one word with a learned merge list (applied in order) —
    * the encode-side counterpart, usable in a map over any corpus. */
  def segment(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(codePoints(word)) {
      case (s, (a, b)) => mergeSeq(s, a, b)
    }

  /** Column-expression encode: apply a merge list to a word column as
    * pure higher-order expressions (no UDF), one array fold per merge.
    *
    * The fold (merge the running LAST symbol with the next element
    * when they equal the pair) is equivalent to the canonical
    * left-to-right non-overlapping scan: a merge replaces the last
    * symbol with a+b, and since b is non-empty a+b ≠ a, the freshly
    * merged symbol can never re-trigger as the left half of the same
    * pair — exactly the scan's skip-ahead.
    *
    * Merges are inlined as plan literals, so this path fits the
    * bounded merge lists a demo/spec uses (plan size grows per merge);
    * production-sized vocabularies (30k+ merges) should map with
    * [[segment]] over a broadcast merge list instead. Char split is
    * UTF-16-unit based (`split(w, "")`) — for non-BMP alphabets use
    * [[segment]], which splits true code points.
    */
  def encodeExpr(word: org.apache.spark.sql.Column,
                 merges: Seq[(String, String)]): org.apache.spark.sql.Column =
    merges.foldLeft(split(word, "")) { case (syms, (a, b)) =>
      aggregate(syms, array().cast("array<string>"), (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))
    }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV ("k minimum values" / bottom-k) distinct-count sketch.
  *
  * The classic mergeable cardinality estimator (Bar-Yossef et al. 2002;
  * the same family Beyer et al. 2007 analyze): hash every value into
  * [0, 2^52), keep only the k SMALLEST distinct hash values per group,
  * and estimate the distinct count from how tightly those minima crowd
  * zero — `(k-1) * 2^52 / h_(k)`. If a group keeps fewer than k hashes
  * the sketch IS its distinct set and the count is exact.
  *
  * Why this exists next to `approx_count_distinct` (HLL++): the HLL
  * estimate depends on engine-internal hashing and register math, so it
  * can only be gated by error ENVELOPE (`q_approx_stats_gate`). KMV
  * built on md5 is a pure function of the value set — every kept hash,
  * and therefore the estimate, is bit-reproducible in any engine with
  * md5, which makes it the one cardinality sketch an external oracle
  * can hash-match EXACTLY. It is also the sketch a 100 TB pipeline can
  * persist per partition/day and fold associatively afterwards:
  * `merge(sketch(A), sketch(B)) == sketch(A union B)` by construction.
  *
  * Scale shape: the aggregation is a bounded-buffer `Aggregator` (same
  * pattern as [[TopK]]) — each map task reduces its slice to ≤ k longs
  * per group BEFORE the exchange (partial ObjectHashAggregate), so the
  * shuffle carries ≤ k·groups·tasks longs no matter how many rows or how
  * skewed the groups. The 52-bit hash is chosen so `CAST(h AS DOUBLE)`
  * is exact (≤ 2^52 fits the mantissa) and the estimate arithmetic is
  * the identical IEEE expression on both engines.
  *
  * Reference frame: the reference counts found/not-found file sets
  * exactly (`app/app.py:166-168`); at corpus scale the same "how many
  * distinct?" question needs a mergeable sketch, and this one stays
  * oracle-checkable.
  */
object Kmv {

  /** 52-bit hash: first 13 hex chars of md5, exactly representable as a
    * double on both engines.
    */
  def hash52(c: Column): Column =
    conv(substring(md5(c), 1, 13), 16, 10).cast("long")

  /** Bounded bottom-k-distinct buffer: ascending sorted list of ≤ k
    * distinct hashes. Deterministic under any partitioning/merge order —
    * the result is the set of k smallest distinct values, a total
    * function of the input set.
    */
  final class BottomKAgg(k: Int)
      extends Aggregator[Long, List[Long], List[Long]] {
    require(k > 0, s"k must be positive, got $k")

    override def zero: List[Long] = Nil

    override def reduce(b: List[Long], a: Long): List[Long] =
      // fast reject: buffer full and candidate >= current ceiling
      if (b.lengthCompare(k) >= 0 && a >= b.last) b
      else if (b.contains(a)) b
      else (a :: b).sorted.take(k)

    override def merge(b1: List[Long], b2: List[Long]): List[Long] =
      (b1 ++ b2).distinct.sorted.take(k)

    override def finish(r: List[Long]): List[Long] = r.sorted

    override def bufferEncoder: Encoder[List[Long]] =
      ExpressionEncoder[List[Long]]()

    override def outputEncoder: Encoder[List[Long]] =
      ExpressionEncoder[List[Long]]()
  }

  /** Per-group sketch: (g, kept array<long> ascending, ≤ k entries). */
  def sketch(df: DataFrame, groupCol: Column, valueCol: Column,
             k: Int): DataFrame = {
    val agg = udaf(new BottomKAgg(k), Encoders.scalaLong)
    df.groupBy(groupCol.as("g"))
      .agg(agg(hash52(valueCol)).as("kept"))
  }

  /** Distinct-count estimate from a kept array: exact size when the
    * sketch is not full, else `floor((k-1)*2^52 / h_(k))`. `(k-1)*2^52`
    * is small-int × power-of-two (exact double); `h_(k) < 2^52` is exact;
    * the division and floor are the same IEEE ops in any engine.
    */
  def estimate(kept: Column, k: Int): Column = {
    val numer = (k - 1).toDouble * 4503599627370496.0 // (k-1) * 2^52
    when(size(kept) < k, size(kept).cast("long"))
      .otherwise(floor(lit(numer) / element_at(kept, k).cast("double"))
        .cast("long"))
  }

  /** SQL fragment: the same 52-bit hash in portable SQL (DuckDB has no
    * base-16 `conv`, so the 13 nibbles are assembled positionally).
    */
  def hash52Sql(expr: String): String =
    (1 to 13).map { i =>
      val mult = 1L << ((13 - i) * 4)
      s"(CAST(strpos('0123456789abcdef', substring(md5($expr), $i, 1)) - 1 AS BIGINT) * $mult)"
    }.mkString("(", " + ", ")")

  /** SQL fragment for [[estimate]] over (n_kept, kth_hash) columns. */
  def estimateSql(nKept: String, kth: String, k: Int): String = {
    val numer = ((k - 1).toLong * 4503599627370496L).toString + ".0"
    s"CASE WHEN $nKept < $k THEN $nKept ELSE CAST(FLOOR($numer / CAST($kth AS DOUBLE)) AS BIGINT) END"
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k per group as a real aggregate, not a window.
  *
  * The standard `row_number() OVER (PARTITION BY g ORDER BY v DESC)` plan
  * shuffles EVERY input row to the group's reducer and sorts the whole
  * group — at 100 TB that is a full-data exchange whose skewed groups
  * (one customer with 10^9 orders) serialize through single tasks. This
  * operator instead aggregates with a bounded buffer: each map task
  * reduces its slice to at most k rows per group before the exchange
  * (partial ObjectHashAggregate), so the shuffle carries ≤ k·groups·tasks
  * rows and the reduce side merges k-lists — skew-immune and
  * orders-of-magnitude less I/O when k ≪ rows-per-group.
  *
  * Determinism: ordering is (score DESC, id ASC) at every step — reduce,
  * merge, and finish — so the result is a total function of the input
  * set, independent of partitioning and merge order (required for the
  * DuckDB oracle hash-parity gate).
  */
object TopK {

  /** One scored row: `id` is the tie-break (ascending) payload key. */
  case class ScoredId(score: Double, id: Long)

  private def ord(s: ScoredId): (Double, Long) = (-s.score, s.id)

  /** Typed aggregator keeping the k smallest under `ord` (= largest
    * score). Buffer is a plain sorted List — k is small by contract, so
    * insertion cost is O(k) with zero allocation churn beyond the list
    * cells, and the buffer encoder stays a product encoder (no kryo, so
    * the ObjectHashAggregate rows remain inspectable).
    */
  final class TopKAgg(k: Int)
      extends Aggregator[ScoredId, List[ScoredId], List[ScoredId]] {
    require(k > 0, s"k must be positive, got $k")

    override def zero: List[ScoredId] = Nil

    override def reduce(b: List[ScoredId], a: ScoredId): List[ScoredId] =
      // Fast reject: buffer full and candidate worse than current floor.
      if (b.lengthCompare(k) >= 0 &&
          Ordering[(Double, Long)].gteq(ord(a), ord(b.last))) b
      else ((a :: b).sortBy(ord)).take(k)

    override def merge(b1: List[ScoredId], b2: List[ScoredId]): List[ScoredId] =
      (b1 ++ b2).sortBy(ord).take(k)

    override def finish(r: List[ScoredId]): List[ScoredId] = r.sortBy(ord)

    override def bufferEncoder: Encoder[List[ScoredId]] =
      ExpressionEncoder[List[ScoredId]]()

    override def outputEncoder: Encoder[List[ScoredId]] =
      ExpressionEncoder[List[ScoredId]]()
  }

  /** Top-k rows per group, long form: (groupCol, rk 1..k, id, score).
    *
    * Equivalent to `row_number` ≤ k over (score DESC, id ASC), but
    * executed as a partial-aggregating ObjectHashAggregate (see class
    * doc). Output ranks are 1-based.
    */
  def perGroup(df: DataFrame, groupCol: Column, scoreCol: Column,
               idCol: Column, k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k), Encoders.product[ScoredId])
    df.groupBy(groupCol.as("g"))
      .agg(agg(scoreCol.cast("double"), idCol.cast("long")).as("topk"))
      .select(col("g"), posexplode(col("topk")))
      .select(col("g"), (col("pos") + 1).cast("int").as("rk"),
        col("col.id").as("id"), col("col.score").as("score"))
  }
}

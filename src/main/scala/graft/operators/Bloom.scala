package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter existence prefilter — the 100 TB shape of "which big-side
  * rows have a key in this set?" (reference: the per-file existence probe
  * of app/app.py:117-131, already batched as a semi-join in O9).
  *
  * A plain semi-join shuffles the ENTIRE big side on the key. At 100 TB
  * that exchange is the cost. Here the small side is folded into a
  * compact bloom sketch (one aggregate; KBs–MBs for millions of keys),
  * the sketch travels to every task as a plan literal, and the big side
  * is prefiltered MAP-SIDE — only the ~fpp false-positive fraction plus
  * the true matches reach the exact semi-join's exchange. No false
  * negatives, so `semiJoin` returns exactly the plain semi-join's rows;
  * the bloom pass only removes shuffle volume. This is the same
  * mechanism Spark's AQE runtime filter injects for selective joins,
  * exposed as an explicit operator with a caller-controlled fpp.
  *
  * Uses Spark's native `BloomFilterAggregate` / `BloomFilterMightContain`
  * Catalyst expressions (codegen'd, zero UDF overhead); keys are
  * xxhash64-folded exactly as Spark's injected runtime filters do.
  */
object Bloom {

  private def xx(c: Column) = new XxHash64(Seq(Bridge.expression(c)), 42)

  /** Optimal bit count for `n` items at false-positive rate `fpp`. */
  private def numBits(n: Long, fpp: Double): Long = {
    val ln2 = math.log(2.0)
    math.max(64L, math.ceil(-n * math.log(fpp) / (ln2 * ln2)).toLong)
  }

  /** Fold `keys(keyCol)` into a serialized bloom sketch (one aggregate
    * job over the small side; the blob is a plan-literal thereafter).
    * BloomFilterAggregate silently CLAMPS to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`
    * (defaults 4M items / 64M bits) — past that the realized fpp
    * quietly degrades — so the confs are raised here to the requested
    * size before aggregating. */
  def bloomOf(keys: DataFrame, keyCol: String, fpp: Double = 0.01): Array[Byte] = {
    val n = math.max(keys.count(), 1L)
    val bits = numBits(n, fpp)
    val conf = keys.sparkSession.conf
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    if (conf.get(itemsKey, "4000000").toLong < n)
      conf.set(itemsKey, n.toString)
    if (conf.get(bitsKey, "67108864").toLong < bits)
      conf.set(bitsKey, bits.toString)
    val agg = new BloomFilterAggregate(xx(col(keyCol)),
      Literal(n), Literal(bits)).toAggregateExpression()
    keys.select(Bridge.column(agg).as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe against a prebuilt sketch. True for
    * every present key (no false negatives); true for ~fpp absent ones. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(new org.apache.spark.sql.catalyst.expressions
      .BloomFilterMightContain(Literal(bloom, BinaryType), xx(key)))

  /** Exact semi-join with a bloom prefilter: equals
    * `big.join(keys, bigKey === keyCol, "left_semi")` row-for-row, but
    * only bloom survivors are shuffled. `keys` must be the small side
    * (its sketch is materialized on the driver and inlined). */
  def semiJoin(big: DataFrame, keys: DataFrame, bigKey: String,
               keyCol: String, fpp: Double = 0.01): DataFrame = {
    val bf = bloomOf(keys, keyCol, fpp)
    // rename the key side so bigKey == keyCol can't make the join
    // condition ambiguous
    big.filter(mightContain(bf, col(bigKey)))
      .join(keys.select(col(keyCol).as("__bloom_key")),
        col(bigKey) === col("__bloom_key"), "left_semi")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: key salting.
  *
  * A hot key (one customer with 10⁸ orders, one shingle in every
  * document) funnels its entire partition through a single task. AQE's
  * skew-join split handles sort-merge cases automatically; salting is
  * the explicit, always-available fallback and the only option when the
  * skewed side feeds an aggregation.
  *
  * `saltedJoin` fans the LEFT (skewed) side out across `salts`
  * sub-keys and replicates the RIGHT side once per salt, so the hot
  * key's rows spread over `salts` tasks. Result set is IDENTICAL to the
  * plain equi-join — verified by the `q_salted_join` oracle, which runs
  * the un-salted SQL.
  *
  * The salt is derived from a stable hash of a distributing column
  * (NOT a random number — deterministic retries, reproducible plans).
  */
object Skew {

  /** Deterministic salt in [0, salts) from a distributing column. */
  def saltOf(c: Column, salts: Int): Column = pmod(hash(c), lit(salts))

  /** Equi-join `left.key == right.key` with the left side salted.
    *
    * @param distributeBy a left-side column whose hash spreads the hot
    *                     key's rows (e.g. the fact table's line number)
    */
  /** Join types for which left-side salting preserves semantics —
    * right/full outer would emit each unmatched right row once per salt.
    */
  private val saltSafe = Set("inner", "left", "leftouter", "leftsemi",
    "leftanti", "cross")

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 distributeBy: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(saltSafe.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin preserves semantics only for inner/left_outer/left_semi/" +
        s"left_anti/cross, got '$joinType' (right/full outer would duplicate " +
        "unmatched right rows once per salt)")
    val l = left.withColumn("__salt", saltOf(col(distributeBy), salts))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Salting with MEASURED hot keys: a Misra–Gries pass over the left
    * join column nominates keys above `hotMinCount` (exact verify, the
    * HeavyHitters two-phase), and ONLY those keys are salted — the cold
    * long tail joins plainly, so the right side is replicated
    * `salts`-fold only for the handful of hot keys instead of the whole
    * table. The adaptive form of `saltedJoin`: blanket salting pays
    * salts× replication on 100% of the right side; adaptive pays it on
    * |hot| keys (typically a few dozen at 100 TB).
    *
    * Result is identical to the plain equi-join for the salt-safe join
    * types (hot and cold partitions are disjoint by key; union of the
    * two joins = join of the union).
    */
  def adaptiveSaltedJoin(left: DataFrame, right: DataFrame, key: String,
                         distributeBy: String, salts: Int,
                         hotMinCount: Long,
                         joinType: String = "inner"): DataFrame = {
    require(saltSafe.contains(joinType.toLowerCase.replace("_", "")),
      s"adaptiveSaltedJoin: unsupported join type '$joinType'")
    // no broadcast hint on the hot set: it is data-dependent (up to
    // N/hotMinCount keys) — AQE broadcasts the usual tiny case and a
    // pathological hot set degrades to a shuffle join instead of an
    // oversized broadcast (same reasoning as frequentItems' phase 2)
    val hot = HeavyHitters.frequentItems(left, col(key), hotMinCount)
      .select(col("item").cast(left.schema(key).dataType).as(key))
      .localCheckpoint(true) // consumed 4×
    val lHot = left.join(hot, Seq(key), "left_semi")
    val lCold = left.join(hot, Seq(key), "left_anti")
    val rHot = right.join(hot, Seq(key), "left_semi")
    val rCold = right.join(hot, Seq(key), "left_anti")
    saltedJoin(lHot, rHot, key, distributeBy, salts, joinType)
      .unionByName(lCold.join(rCold, Seq(key), joinType))
  }
}

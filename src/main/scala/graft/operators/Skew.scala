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
}

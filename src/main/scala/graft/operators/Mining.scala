package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pattern-mining operators for corpus preparation: skip-gram
  * co-occurrence (the counting pass under word2vec/GloVe-style
  * embedding training) and market-basket association rules
  * (support / confidence / lift).
  *
  * Scale discipline shared by both:
  *   - Pair GENERATION is map-side. Skip-grams come from zipping a
  *     token array against itself shifted by 1..window — no join, no
  *     shuffle, fanout exactly `window`× the token stream. Basket
  *     pairs come from a self-equi-join on the basket key whose
  *     per-key fanout is bounded by the (frequent-)item count per
  *     basket, never the corpus.
  *   - MARGINALS are groupBy aggregates joined back on the key — the
  *     de-skewed shape (map-combinable, AQE-skew-splittable) — never
  *     a window over a Zipfian token key.
  */
object Mining {

  /** Skip-gram pairs (w1, w2) for every token and each of the `window`
    * tokens following it, generated entirely map-side: for offset k,
    * zip `toks` with itself shifted k left. Directional (left context
    * word first); empty tokens (split artifacts) are dropped pairwise.
    *
    * Returns one row per pair OCCURRENCE — aggregate downstream.
    */
  def skipgramPairs(docs: DataFrame, toksCol: Column, window: Int)
      : DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val pairs = flatten(transform(sequence(lit(1), lit(window)), off => {
      // slice length can't go negative: clamp at 0 (empty slice)
      val n = greatest(size(toksCol) - off, lit(0))
      zip_with(slice(toksCol, lit(1), n), slice(toksCol, off + lit(1), n),
        (a, b) => struct(a.as("w1"), b.as("w2")))
    }))
    docs.select(explode(pairs).as("pr"))
      .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
  }

  /** Pointwise mutual information over a pair-count table
    * `(w1, w2, c)`: PMI = ln(c·N / (cx·cy)) with marginals cx, cy and
    * grand total N taken from the pair table itself. Marginals are
    * groupBy + equi-join back (both joins on Zipfian word keys —
    * AQE-splittable); N is a one-row broadcast. `round` truncates the
    * transcendental to a cross-engine-stable number of decimals.
    *
    * `pairCounts` is consumed from four plan branches (both marginals,
    * N, and the main join) — persist or `localCheckpoint` it before
    * calling when its lineage is expensive to recompute.
    */
  def pmi(pairCounts: DataFrame, roundTo: Int = 6): DataFrame = {
    val cx = pairCounts.groupBy("w1").agg(sum(col("c")).as("cx"))
    val cy = pairCounts.groupBy("w2").agg(sum(col("c")).as("cy"))
    val n = pairCounts.agg(sum(col("c")).as("n"))
    pairCounts.join(cx, "w1").join(cy, "w2").crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c"),
        round(log(col("c").cast("double") * col("n") /
          (col("cx").cast("double") * col("cy").cast("double"))), roundTo)
          .as("pmi"))
  }

  /** Association rules over baskets `(basketCol, itemCol)` (rows need
    * not be distinct — deduped here). For every directed pair of
    * distinct items co-present in a basket:
    *
    *   support    = #baskets containing both
    *   confidence = support / #baskets containing antecedent
    *   lift       = support·N / (#ante · #cons)   (N = #baskets)
    *
    * Apriori prune: items below `minSupport` baskets are dropped
    * BEFORE pairing, so the pair space is bounded by frequent items
    * only — with a long-tail item vocabulary this is what keeps the
    * self-join fanout affordable; the join itself is an equi-join on
    * the basket key with per-basket-bounded fanout, never all-pairs
    * across baskets. Rules below `minSupport` joint baskets are
    * dropped after counting.
    *
    * The deduped basket table feeds three plan branches (item counts
    * and both sides of the pair join) — persist or `localCheckpoint`
    * the input when its lineage is expensive to recompute.
    */
  def associationRules(baskets: DataFrame, basketCol: Column,
      itemCol: Column, minSupport: Long): DataFrame = {
    require(minSupport >= 1,
      "minSupport must be >= 1 (0 disables the apriori prune that " +
        s"bounds the pair self-join), got $minSupport")
    val b = baskets.select(basketCol.as("bk"), itemCol.as("item")).distinct()
    val ci = b.groupBy("item").agg(count(lit(1)).as("ci"))
    val frequent = b.join(ci.filter(col("ci") >= minSupport), "item")
      .select("bk", "item")
    val a = frequent.select(col("bk"), col("item").as("ante"))
    val c = frequent.select(col("bk"), col("item").as("cons"))
    val pr = a.join(c, Seq("bk")).filter(col("ante") =!= col("cons"))
      .groupBy("ante", "cons").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val n = b.select("bk").agg(count_distinct(col("bk")).as("n"))
    pr.join(ci.select(col("item").as("ante"), col("ci").as("ca")), "ante")
      .join(ci.select(col("item").as("cons"), col("ci").as("cb")), "cons")
      .crossJoin(broadcast(n))
      .select(col("ante"), col("cons"), col("support"),
        round(col("support").cast("double") / col("ca").cast("double"), 6)
          .as("confidence"),
        round(col("support").cast("double") * col("n") /
          (col("ca").cast("double") * col("cb").cast("double")), 6)
          .as("lift"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix PLANNING: allocate a total token budget across
  * sources under a per-source repetition cap — the data-constrained
  * scaling decision (after Muennighoff et al. 2023: repeating a
  * source beyond a few epochs stops paying, so a mix cannot just
  * sample proportionally when the budget exceeds unique supply).
  *
  * Each source i has `available` unique tokens a_i and may contribute
  * at most c_i = a_i · maxRep tokens. The allocation is WATER-FILLING:
  * every source gets min(c_i, θ) with the level θ chosen so the total
  * spends the budget — small sources saturate at their cap, large
  * ones share the rest evenly. Solved EXACTLY in integers over the
  * sources-sized frame (never the corpus):
  *
  *   1. sort by (cap, group); k = rank, prefix_k = Σ_{j≤k} cap_j;
  *   2. source k saturates iff giving every source from k on its own
  *      cap_k still fits: prefix_{k-1} + cap_k·(n−k+1) ≤ budget —
  *      with caps ascending the saturated set is the maximal prefix
  *      kstar of the sort order;
  *   3. the m = n−kstar unsaturated sources split the remainder
  *      rem = budget − prefix_kstar as base = rem div m each, with
  *      the mod-m leftover distributed +1 to the FIRST leftover
  *      unsaturated sources in sort order (fully deterministic; by
  *      kstar's maximality base+1 never exceeds the next cap).
  *
  * Total allocated = min(budget, Σ cap) exactly. One window + two
  * single-row aggregates over #sources rows; at 100 TB the only
  * corpus-sized work is the upstream token count.
  */
object MixPlan {

  /** @param avail (groupCol, availCol) — unique tokens per source
    * @return (group, available, cap, alloc, repetition_ppm,
    *         saturated), one row per source; repetition_ppm =
    *         alloc·1e6 div available (1e6 = one epoch over the
    *         source's unique supply)
    */
  def allocate(avail: DataFrame, budget: Long, maxRep: Int,
               groupCol: String = "source",
               availCol: String = "available"): DataFrame = {
    require(maxRep >= 1, s"maxRep must be >= 1, got $maxRep")
    require(budget >= 0, s"budget must be >= 0, got $budget")
    // a null/zero/negative availability would poison the water-fill
    // silently (null caps sort first and null the prefix arithmetic;
    // available = 0 divides by zero in repetition_ppm), and
    // available * maxRep can overflow Long — fail loudly instead.
    // One single-row agg over the #sources frame (allocate collects
    // source-sized scalars below anyway). The sum coalesces so an
    // EMPTY avail frame reads n_bad = 0 (sum over zero rows is null)
    // and falls through to the empty-plan output instead of a bare
    // NullPointerException out of getLong.
    val guard = avail.agg(
      coalesce(sum(when(
        col(availCol).isNull || col(availCol).cast("long") <= 0,
        1L).otherwise(0L)), lit(0L)).as("n_bad"),
      max(col(availCol).cast("long")).as("max_avail")).collect()(0)
    require(guard.getLong(0) == 0,
      s"allocate: ${guard.getLong(0)} source row(s) have null/zero/" +
        s"negative '$availCol' — every source must declare a positive " +
        "unique-token supply")
    require(guard.isNullAt(1) ||
      guard.getLong(1) <= Long.MaxValue / maxRep,
      s"allocate: available * maxRep overflows Long " +
        s"(max available ${guard.getLong(1)}, maxRep $maxRep)")
    val c = avail.select(col(groupCol).as("group"),
      col(availCol).cast("long").as("available"),
      (col(availCol).cast("long") * maxRep).as("cap"))
    // unpartitioned window: BOUNDED — one row per source group (the
    // mix catalog), never corpus rows
    val w = Window.orderBy(col("cap").asc, col("group").asc)
    val o = c.withColumn("k", row_number().over(w))
      .withColumn("prefix", sum(col("cap")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint(false) // feeds kstar agg + the final projection
    // n first, then kstar (each a single-row agg over #sources rows;
    // the saturation test needs n inside its predicate)
    val n = o.agg(count(lit(1))).collect()(0).getLong(0)
    val kstar = o.agg(coalesce(max(when(
        col("prefix") - col("cap") + col("cap") * (lit(n) - col("k") + 1L)
          <= budget, col("k"))), lit(0))).collect()(0).getInt(0).toLong
    val pks =
      if (kstar == 0L) 0L
      else o.filter(col("k") === kstar).select(col("prefix"))
        .collect()(0).getLong(0)
    val m = n - kstar
    val rem = budget - pks
    val base = if (m > 0) rem / m else 0L
    val leftover = if (m > 0) rem % m else 0L
    o.select(col("group").as(groupCol), col("available"), col("cap"),
        when(col("k") <= kstar, col("cap"))
          .otherwise(lit(base) +
            when(col("k") - kstar <= leftover, 1L).otherwise(0L))
          .as("alloc"),
        (col("k") <= kstar).as("saturated"))
      .withColumn("repetition_ppm",
        expr("alloc * 1000000 div available"))
      .select(col(groupCol), col("available"), col("cap"), col("alloc"),
        col("repetition_ppm"), col("saturated"))
  }

  /** MATERIALIZE a mix plan into the epoch schedule it implies — the
    * step that turns `alloc > available` (repetition, the
    * data-constrained regime) into an actual deterministic training
    * order instead of just a budget:
    *
    *   - every document of a source appears in `alloc div available`
    *     FULL epochs (allocate caps alloc at available·maxRep, so
    *     this is ≤ maxRep — the explode below is bounded by
    *     construction);
    *   - the remainder `alloc mod available` is spent on one PARTIAL
    *     epoch: documents in deterministic md5(id) order stay in
    *     while their INCLUSIVE running token total fits (the same
    *     prefix rule the curation token-budget stage enforces, so
    *     plan → enforce → materialize all agree on which rows repeat);
    *   - within each (source, epoch) the training order `ord` ranks
    *     by md5(epoch:id) — a fresh deterministic shuffle per epoch,
    *     reproducible under any partitioning.
    *
    * @param docs (groupCol, idCol, tokCol) — one row per document
    *             with its token count
    * @param plan [[allocate]]'s output for the same groups
    * @param carry extra doc columns carried through to the output —
    *              a downstream consumer (e.g. sequence packing) that
    *              needs per-doc attributes takes them HERE instead of
    *              joining the schedule back to the corpus-sized docs
    *              frame (that join broadcasts at test scale and
    *              silently becomes a full shuffle join at 100 TB)
    * @return (groupCol, idCol, carry..., epoch, ord) — one row per
    *         scheduled appearance; a document with no appearance
    *         emits nothing
    *
    * Scale shape: the plan broadcasts (#sources rows); the schedule
    * is two keyed windows over the docs frame (source-partitioned,
    * then (source, epoch)-partitioned — the second reuses the first's
    * hash(source) exchange) + one bounded explode — no corpus-sized
    * sort, no driver loop.
    */
  def materializeEpochs(docs: DataFrame, plan: DataFrame,
                        groupCol: String = "source",
                        idCol: String = "doc_id",
                        tokCol: String = "n_tokens",
                        carry: Seq[String] = Nil): DataFrame = {
    val p = plan.select(col(groupCol),
      expr("alloc div available").as("__full"),
      expr("alloc % available").as("__rem"))
    // BANDED inclusive prefix sum (Banded.prefixSum): the partial
    // epoch spends the remainder on the md5(id)-ordered token prefix,
    // and a mega source's cumulative window would otherwise sort in
    // ONE task at corpus scale
    val scheduled = Banded.prefixSum(
        docs.join(broadcast(p), Seq(groupCol)),
        Seq(groupCol), idCol, col(tokCol), "__cum")
      .withColumn("__n", col("__full") +
        when(col("__cum") <= col("__rem"), 1L).otherwise(0L))
      .filter(col("__n") > 0)
      .select(col(groupCol) +: col(idCol) +: carry.map(col) :+
        explode(expr("sequence(0L, __n - 1)")).as("epoch"): _*)
    val wE = Window.partitionBy(col(groupCol), col("epoch"))
      .orderBy(md5(concat_ws(":", col("epoch"), col(idCol))).asc,
        col(idCol).asc)
    scheduled
      .withColumn("ord", row_number().over(wE).cast("long"))
      .select(col(groupCol) +: col(idCol) +: carry.map(col) :+
        col("epoch") :+ col("ord"): _*)
  }
}

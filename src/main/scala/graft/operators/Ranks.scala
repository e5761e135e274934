package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordering primitives — the scale-correct way to
  * compute running totals and ranks over a corpus-sized, globally
  * ordered column without ever collapsing it into one partition.
  *
  * The shape (shared by `q_ks_test`, `q_mannwhitney_u`, `q_spearman`):
  *   1. range-partition by the order column and sort within partitions
  *      (a localCheckpoint pins partition ids for the two consumers);
  *   2. one tiny per-partition-totals aggregation (#partitions rows);
  *   3. exclusive offsets over that tiny table (a single-partition
  *      window over dozens of rows, never the corpus);
  *   4. offsets broadcast-joined back by partition id + a cumulative
  *      window PARTITIONED by partition id.
  * Every result column is an exact integer, so the output is invariant
  * to where the range boundaries land — determinism does not depend on
  * the sampling inside RangePartitioner.
  *
  * At 1000 executors this is two corpus passes (sort + windowed scan)
  * and one dozens-of-rows driver-side table — the same structure
  * `Profile.exactQuantiles` uses for order statistics, generalized to
  * carry running sums.
  */
object Ranks {

  /** Append exclusive-prefix ("before this row") and inclusive-prefix
    * sums of `sumCols` under the global `orderCol` ordering. Output
    * columns: `pre_<c>` (sum over strictly-earlier rows) and
    * `cum_<c>` (including this row). Rows with equal `orderCol` values
    * must be pre-aggregated by the caller (one row per distinct value)
    * — prefix semantics across ties are otherwise order-dependent.
    */
  def prefixSums(df: DataFrame, orderCol: String, sumCols: Seq[String],
                 partitions: Int = 32): DataFrame = {
    require(sumCols.nonEmpty)
    val sorted = df.repartitionByRange(partitions, col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false) // pin pids: totals pass + prefix pass
    val ptotU = sorted.groupBy("__pid")
      .agg(sum(sumCols.head).as(s"__t_${sumCols.head}"),
        sumCols.tail.map(c => sum(c).as(s"__t_$c")): _*)
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = sumCols.foldLeft(ptotU) { (d, c) =>
      d.withColumn(s"__off_$c",
        coalesce(sum(s"__t_$c").over(wOff), lit(0L)))
    }.select("__pid", sumCols.map(c => s"__off_$c"): _*)
    val wCum = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = sorted.join(broadcast(offs), "__pid")
    val withCums = sumCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"cum_$c", col(s"__off_$c") + sum(c).over(wCum))
        .withColumn(s"pre_$c", col(s"cum_$c") - col(c))
    }
    withCums.drop("__pid" +: sumCols.map(c => s"__off_$c"): _*)
  }

  /** Append a 1-based global row number `rn` under the lexicographic
    * `orderCols` ordering WITHOUT a single-task global sort. The
    * composite key must be unique per row (give a tie-breaking id as
    * the last column) — then `rn` is the row's position in the total
    * order, invariant to where RangePartitioner's sampled boundaries
    * land, so the output is deterministic across partition counts.
    *
    * Shape: range-partition + sort (distributed), a #partitions-row
    * totals agg, exclusive offsets over that tiny table, offsets
    * broadcast back, and a within-partition row_number window keyed by
    * partition id — each window group is one already-range-balanced
    * partition, never the corpus.
    */
  def rowNumbers(df: DataFrame, orderCols: Seq[String],
                 partitions: Int = 32): DataFrame = {
    require(orderCols.nonEmpty)
    val sorted = df.repartitionByRange(partitions, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.head, orderCols.tail: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false) // pin pids: totals pass + numbering pass
    val ptot = sorted.groupBy("__pid").agg(count(lit(1)).as("__n"))
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = ptot
      .withColumn("__off", coalesce(sum("__n").over(wOff), lit(0L)))
      .select("__pid", "__off")
    val wIn = Window.partitionBy("__pid")
      .orderBy(orderCols.map(c => col(c).asc): _*)
    sorted.join(broadcast(offs), "__pid")
      .withColumn("rn", col("__off") + row_number().over(wIn))
      .drop("__pid", "__off")
  }

  /** Per-distinct-value average ranks in DOUBLED fixed point (exact
    * integers — a tied group's average rank is a multiple of 1/2):
    * for each distinct `valueCol`, `cnt` (tie size) and
    * `rank_x2 = 2·(#rows strictly below) + cnt + 1`. Join back on the
    * value to rank the full corpus. */
  def avgRanks(df: DataFrame, valueCol: String,
               partitions: Int = 32): DataFrame = {
    val hist = df.groupBy(valueCol).agg(count(lit(1)).as("cnt"))
    prefixSums(hist, valueCol, Seq("cnt"), partitions)
      .withColumn("rank_x2", lit(2L) * col("pre_cnt") + col("cnt") + 1L)
      .select(col(valueCol), col("cnt"), col("rank_x2"))
  }

}

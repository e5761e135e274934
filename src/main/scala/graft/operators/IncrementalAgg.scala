package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (merge-on-write) aggregation: a running per-key
  * aggregate maintained across batch arrivals WITHOUT recomputing
  * history — the materialized-view pattern behind daily-refresh
  * dashboards over append-only 100 TB facts.
  *
  * State is (keys, cnt, sum_d) — count and exact-DECIMAL sum, both
  * MERGEABLE: folding a new batch is partial-aggregate(batch) ∪ state →
  * re-aggregate, so each update costs O(batch + |state|) regardless of
  * how much history the state summarizes. Exact decimal makes the
  * merged sum independent of arrival order and batch boundaries — the
  * state after N updates equals the one-shot aggregate bit-for-bit.
  * Derived values (avg = sum/cnt) are computed at READ time from the
  * mergeable parts, never stored (averages don't merge).
  *
  * The state table uses [[Layout.swapIn]]'s crash-safe
  * rename-to-backup swap: a crash mid-swap leaves the backup intact
  * and the next update/read recovers it — history is never silently
  * lost.
  */
object IncrementalAgg {

  private def partial(batch: DataFrame, keys: Seq[String],
                      valueCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sum(col(valueCol).cast("decimal(18,2)")).cast("decimal(38,2)").as("sum_d"))

  /** Fold one batch into the state at `stateDir` (created on first
    * use); returns the updated state. */
  def update(spark: SparkSession, stateDir: String, batch: DataFrame,
             keys: Seq[String], valueCol: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Layout.recoverSwap(fs, stateDir)
    val fresh = partial(batch, keys, valueCol)
    val merged =
      if (fs.exists(p)) {
        // materialize the merge BEFORE the swap touches the directory
        // the plan reads from
        spark.read.parquet(stateDir).union(fresh)
          .groupBy(keys.map(col): _*).agg(
            sum(col("cnt")).cast("long").as("cnt"),
            sum(col("sum_d")).cast("decimal(38,2)").as("sum_d"))
      } else fresh
    val tmp = stateDir.stripSuffix("/") + "__updating"
    merged.write.mode("overwrite").parquet(tmp)
    Layout.swapIn(fs, stateDir, tmp)
    spark.read.parquet(stateDir)
  }

  /** Read the state with derived columns (the query-facing view). */
  def read(spark: SparkSession, stateDir: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Layout.recoverSwap(fs, stateDir)
    spark.read.parquet(stateDir).withColumn("avg_v",
      col("sum_d").cast("double") / col("cnt"))
  }

  // ---- approximate-distinct state (DataSketches HLL) ----------------
  //
  // COUNT DISTINCT does not merge: yesterday's per-key distinct count
  // plus today's is NOT the union's. The mergeable form is the sketch
  // itself: state stores one HLL per key (KBs, error ~1/sqrt(2^lgK)),
  // each batch folds in via hll_union_agg, and the estimate is derived
  // at read time — the distinct-users-per-day-over-a-year query that is
  // otherwise a full 100 TB rescan becomes O(batch + |state|).

  private def partialHll(batch: DataFrame, keys: Seq[String],
                         distinctCol: String, lgK: Int): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(distinctCol), lit(lgK)).as("hll"))

  /** Fold one batch into the HLL-distinct state at `stateDir`. */
  def updateDistinct(spark: SparkSession, stateDir: String,
                     batch: DataFrame, keys: Seq[String],
                     distinctCol: String, lgK: Int = 12): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Layout.recoverSwap(fs, stateDir)
    val fresh = partialHll(batch, keys, distinctCol, lgK)
    val merged =
      if (fs.exists(p)) {
        spark.read.parquet(stateDir).union(fresh)
          .groupBy(keys.map(col): _*)
          .agg(hll_union_agg(col("hll")).as("hll"))
      } else fresh
    val tmp = stateDir.stripSuffix("/") + "__updating"
    merged.write.mode("overwrite").parquet(tmp)
    Layout.swapIn(fs, stateDir, tmp)
    spark.read.parquet(stateDir)
  }

  /** Read the distinct state with the derived estimate. */
  def readDistinct(spark: SparkSession, stateDir: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Layout.recoverSwap(fs, stateDir)
    spark.read.parquet(stateDir)
      .withColumn("approx_distinct", hll_sketch_estimate(col("hll")))
  }
}

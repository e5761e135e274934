package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.Exchange

/** Scan-width armor for CPU-dense map phases (tokenize → shingle →
  * md5/minhash, gear CDC, header decode): the map parallelism of a
  * narrow plan is bounded by the SCAN's split count, and a parquet
  * file is splittable only at row-group boundaries — a single-row-group
  * file plans as ONE task no matter how many cores the session has, so
  * a heavy per-row pipeline serializes onto one core while 31 idle
  * (measured: d_cdc_chunks 3.0 s of 3.5 s in one task; t_perplexity
  * 2.1 s). AQE cannot fix this: it coalesces by shuffle BYTES and
  * never sees per-row CPU, and it cannot split a scan stage at all.
  *
  * [[spread]] inserts one round-robin exchange of the RAW rows (cheap:
  * the heavy derived columns do not exist yet) when — and only when —
  * the plan is narrow (no exchange anywhere) and its planned partition
  * count is below the session's default parallelism. Scale-adaptive by
  * construction: a real-scale corpus scan carries thousands of splits,
  * so the guard makes this the identity and no shuffle is ever added
  * at 100 TB; only under-split inputs (one fixture file, a handful of
  * small artifacts) are rebalanced.
  *
  * Call it only on scan-rooted narrow frames (scan/filter/project/
  * union), immediately before the heavy map: a frame that already
  * contains a shuffle is returned untouched (the shuffle re-keys at
  * the session's shuffle width already), and placing it after caller
  * filters keeps predicate pushdown intact.
  */
object Par {

  def spread(df: DataFrame): DataFrame = {
    // streaming frames keep their micro-batch partitioning (probing
    // the physical plan below is a batch-only operation anyway)
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    val plan = df.queryExecution.sparkPlan
    val hasExchange = plan.exists(_.isInstanceOf[Exchange])
    if (hasExchange) df
    else {
      // narrow plan: no exchange → toRdd builds the physical RDD
      // without running any job, so this is a plan-time probe
      val parts = df.queryExecution.toRdd.getNumPartitions
      if (parts >= p) df
      else {
        // hash-partition on the whole row, NOT round-robin: keyless
        // repartition(n) first locally SORTS its input so retried
        // tasks replay the same assignment (SPARK-23207) — a real
        // cost on the one fat upstream task this exists to relieve;
        // a deterministic hash needs no sort and stays retry-safe
        // (guide §2.5)
        df.repartition(p, org.apache.spark.sql.functions.xxhash64(
          df.columns.map(org.apache.spark.sql.functions.col): _*))
      }
    }
  }
}

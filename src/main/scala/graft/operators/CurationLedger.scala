package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted per-run curation-funnel LEDGER — the daily-ops artifact a
  * training-data pipeline pages on: every pipeline-C run appends its
  * funnel report ([[graft.Pipelines.curationReport]]) under a caller-
  * supplied run id, and the trend view turns the accumulated rows into
  * "what moved since yesterday" (the observable sibling of the
  * reference's per-run console report, app/main.py:269-313, given the
  * artifact treatment like the band/IVF/frontier indexes).
  *
  * One parquet table `runs` (run_id, stage, n, seq). `run_id` is a
  * LABEL; run ORDER is owned by the ledger itself: every append stamps
  * an ingest sequence `seq` (one greater than the persisted maximum),
  * so the trend's prev/delta never depends on how a caller happened to
  * name its runs (`wave-10` sorts before `wave-9` lexicographically —
  * the silent mis-delta an id-ordered trend is one caller away from).
  * The ledger is runs × stages sized — never corpus-sized — so every
  * maintenance and read path is trivially broadcastable at any corpus
  * scale; appends follow the caller's single-writer re-run discipline
  * (a double-append is an ops error the [[stats]] gate must surface,
  * not silently repair).
  */
object CurationLedger {

  /** Append one run's funnel report (stage, n) under `runId`, stamped
    * with the next ingest sequence. Rows of one append share one seq.
    */
  def append(spark: SparkSession, path: String, runId: String,
             report: DataFrame): Unit = {
    val next = nextSeq(spark, path)
    report.select(lit(runId).as("run_id"), col("stage"), col("n"),
        lit(next).as("seq"))
      .coalesce(1).write.mode("append").parquet(s"$path/runs")
  }

  /** The next ingest sequence: max persisted seq + 1 (1 for a fresh
    * ledger). Rows written before the seq column existed read back
    * null and count as zero — the first post-upgrade append gets
    * seq 1, and [[trend]]'s nulls-first ordering keeps every legacy
    * run before it. One scalar agg over the runs × stages table.
    */
  private def nextSeq(spark: SparkSession, path: String): Long = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/runs")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) 1L
    else read(spark, path)
      .agg(coalesce(max(col("seq")), lit(0L)))
      .collect()(0).getLong(0) + 1L
  }

  /** Read the ledger; a pre-seq table reads back with a null `seq`
    * column so every consumer sees one schema. mergeSchema: a ledger
    * that crossed the format seam holds files WITH and WITHOUT the
    * seq column in one directory — schema-from-one-file would
    * silently drop seq (or the legacy rows) depending on which file
    * it sampled. The table is runs × stages sized; the footer merge
    * is trivial.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.option("mergeSchema", "true")
      .parquet(s"$path/runs")
    if (df.columns.contains("seq")) df
    else df.withColumn("seq", lit(null).cast("long"))
  }

  /** The trend view: per stage, each run's count next to the previous
    * run's and the delta — the number a daily alert thresholds on.
    * Runs order by the INGEST SEQUENCE (append order), not the run_id
    * string; legacy rows without a seq order first (they predate every
    * stamped append) among themselves by their run id with any
    * trailing NUMERIC suffix zero-padded — so a pre-upgrade ledger
    * written as run-1..run-12 still trends in true order across the
    * migration seam. One window over the runs × stages ledger.
    */
  def trend(ledger: DataFrame): DataFrame = {
    val normId = concat(
      regexp_replace(col("run_id"), "[0-9]+$", ""),
      lpad(regexp_extract(col("run_id"), "([0-9]+)$", 1), 12, "0"))
    val w = Window.partitionBy("stage")
      .orderBy(col("seq").asc_nulls_first, normId.asc, col("run_id").asc)
    ledger.withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("delta", col("n") - col("prev_n"))
  }

  /** Health gate: rows per run_id — a run that appended twice (or a
    * partial append) shows a row count off the stage-count mode.
    */
  def stats(ledger: DataFrame): DataFrame =
    ledger.groupBy("run_id").agg(count(lit(1)).as("n_rows"))
      .orderBy("run_id")
}

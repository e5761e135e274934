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
  * One parquet table `runs` (run_id, stage, n). The ledger is
  * runs × stages sized — never corpus-sized — so every maintenance
  * and read path is trivially broadcastable at any corpus scale; the
  * append is idempotent per (run_id) by the caller's re-run discipline
  * (a re-run day overwrites nothing — readers dedupe by taking the
  * LAST row per (run_id, stage) is deliberately NOT done here: a
  * double-append is an ops error the [[stats]] gate must surface, not
  * silently repair).
  */
object CurationLedger {

  /** Append one run's funnel report (stage, n) under `runId`. */
  def append(spark: SparkSession, path: String, runId: String,
             report: DataFrame): Unit =
    report.select(lit(runId).as("run_id"), col("stage"), col("n"))
      .coalesce(1).write.mode("append").parquet(s"$path/runs")

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/runs")

  /** The trend view: per stage, each run's count next to the previous
    * run's (runs ordered by run_id — date-shaped ids sort correctly)
    * and the delta — the number a daily alert thresholds on. One
    * window over the runs × stages ledger.
    */
  def trend(ledger: DataFrame): DataFrame = {
    val w = Window.partitionBy("stage").orderBy("run_id")
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

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: per-column null counts, distinct counts, and value
  * ranges in ONE pass — the health check run before a 100 TB table is
  * admitted into a pipeline (schema drift, null explosions, constant
  * columns all surface here).
  *
  * Shape: columns unpivot into (col_name, value) structs map-side
  * (explode of a literal-named struct array — no shuffle until the
  * per-column aggregate), then one grouped aggregation over exactly
  * `cols.length` groups. At scale swap `countDistinct` for
  * `approx_count_distinct` — the profile loses nothing it needs.
  */
object Profile {

  /** Attach zero-cost quality gates to a frame: named observed metrics
    * (row count + per-predicate violation counts) accumulated DURING
    * whatever action next runs over the frame — no extra pass over the
    * data, which at 100 TB is the difference between "monitored" and
    * "unmonitored". Read the results from
    * `df.queryExecution.observedMetrics(name)` after the action, or a
    * `QueryExecutionListener` / `StreamingQueryListener` in production.
    *
    * @param checks (metricName, violationPredicate) pairs — each
    *               becomes a count of rows where the predicate holds
    */
  def observed(df: DataFrame, name: String,
               checks: Seq[(String, org.apache.spark.sql.Column)]): DataFrame =
    df.observe(name, count(lit(1)).as("n_rows"),
      checks.map { case (m, p) => count(when(p, 1)).as(m) }: _*)

  /** Profile numeric (double-castable) columns. Nulls count, distincts
    * are exact, min/max are raw values (no arithmetic — safe to compare
    * across engines). */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stacked = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("double").as("v"))): _*)).as("s"))
      .select(col("s.col_name").as("col_name"), col("s.v").as("v"))
    stacked.groupBy("col_name").agg(
      count(lit(1)).as("n_rows"),
      count(when(col("v").isNull, 1)).as("n_nulls"),
      countDistinct(col("v")).as("n_distinct"),
      min(col("v")).as("min_v"),
      max(col("v")).as("max_v"))
  }
}

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

  /** Exact linearly-interpolated quantiles (quantile_cont semantics),
    * computed the way that scales: a range-partitioned global sort +
    * per-partition offset indexing (RDD zipWithIndex — two narrow jobs,
    * never a single-partition window), then a 6-row position lookup.
    * The sketch-based `percentile_approx` (Relational3.approxStats) is the
    * everyday 100 TB path; this is the audit-grade exact one.
    *
    * Returns (q, value) — value = v[lo] + (v[hi] − v[lo])·frac at
    * pos = (n−1)·q, the standard continuous-quantile interpolation.
    */
  def exactQuantiles(df: DataFrame, valueCol: String,
                     qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1))
    val spark = df.sparkSession
    import spark.implicits._
    // localCheckpoint: zipWithIndex already ran the sort eagerly for its
    // partition-count pass, and the frame below is consumed from two
    // plan branches (count agg + candidate join) — without the barrier
    // the global sort would re-execute per branch
    val ranked = df.select(col(valueCol).cast("double").as("x"))
      .filter(col("x").isNotNull)
      .orderBy("x").as[Double].rdd
      .zipWithIndex().toDF("x", "idx")
      .localCheckpoint(false)
    val positions = ranked.agg(count(lit(1)).as("n"))
      .select(explode(array(qs.map(lit): _*)).as("q"), col("n"))
      .withColumn("pos", (col("n") - 1).cast("double") * col("q"))
      .select(col("q"), floor(col("pos")).cast("long").as("lo"),
        ceil(col("pos")).cast("long").as("hi"),
        (col("pos") - floor(col("pos"))).as("frac"))
    // tiny position table broadcast against the ranked run: one scan,
    // two index comparisons per row, ≤ 2·|qs| surviving rows
    ranked.join(broadcast(positions),
        col("idx") === col("lo") || col("idx") === col("hi"))
      .groupBy("q", "frac")
      .agg(max(when(col("idx") === col("lo"), col("x"))).as("vlo"),
        max(when(col("idx") === col("hi"), col("x"))).as("vhi"))
      .select(col("q"),
        (col("vlo") + (col("vhi") - col("vlo")) * col("frac")).as("value"))
  }

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

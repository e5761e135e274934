package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-interval time-series resampling with gap fill — the step
  * between raw events and anything that consumes a regular grid
  * (dashboards, anomaly detection, feature windows for training).
  * Missing bins are materialized from a generated spine, count-like
  * columns zero-fill, and level-like columns carry the last observed
  * value forward.
  *
  * Scale shape: the spine is `distinct keys × sequence(min, max, step)`
  * — the global bin bounds are ONE broadcast row (no driver collect of
  * data; two scalar aggregates), the per-key series generation is a
  * map-side `explode`, and the only data-sized costs are the left join
  * onto the spine (equi-join on key+bin) and one keyed window for the
  * forward fill. Bin count is bounded by the time range / step, never
  * by the event count.
  */
object TimeSeries {

  /** Fill gaps in an already-binned frame.
    *
    * @param binned      aggregated frame: `keys ++ (binCol: timestamp)
    *                    ++ value columns`, at most one row per
    *                    (keys, bin)
    * @param keys        series identity columns
    * @param binCol      timestamp bin column (regular grid, e.g. from
    *                    `date_trunc`)
    * @param step        bin width as a SQL interval, e.g. "1 hour"
    * @param zeroFill    value columns where a missing bin means 0
    *                    (counts, sums)
    * @param forwardFill value columns where a missing bin carries the
    *                    last observed value (levels, averages); null
    *                    until the first observation of the key
    */
  def gapFill(binned: DataFrame, keys: Seq[String], binCol: String,
              step: String, zeroFill: Seq[String],
              forwardFill: Seq[String]): DataFrame = {
    val bounds = binned.agg(min(col(binCol)).as("__lo"), max(col(binCol)).as("__hi"))
    val spine = binned.select(keys.map(col): _*).distinct()
      .crossJoin(broadcast(bounds))
      .select(keys.map(col) :+
        explode(sequence(col("__lo"), col("__hi"), expr(s"INTERVAL $step")))
          .as(binCol): _*)
    val joined = spine.join(binned, keys :+ binCol, "left")
    val zeroed = zeroFill.foldLeft(joined) { (df, c) =>
      df.withColumn(c, coalesce(col(c), lit(0L)))
    }
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(binCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    forwardFill.foldLeft(zeroed) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier ("skyline"): rows where no other row is ≤ on
  * the minimized column and ≥ on the maximized column with at least
  * one strict inequality (the classic price/quality trade-off screen;
  * in a curation pipeline: "cheapest doc at every quality level").
  *
  * Scale shape: the naive definition is an O(n²) dominance self-join.
  * This plan aggregates `max(maxCol)` per distinct minCol value first
  * (map-combinable — the only corpus-wide pass), runs ONE ordered
  * window over that aggregated, domain-bounded frame for the strict
  * prefix max, and joins the verdict back on the minCol key. The
  * single-task window input is the number of DISTINCT minCol values,
  * not the row count; if that domain ever outgrew one task, the same
  * prefix-max splits into per-range partials + a tiny offset broadcast
  * (the two-phase structure Profile.exactQuantiles already uses).
  */
object Frontier {

  /** Rows of `df` on the Pareto frontier of (minimize `minCol`,
    * maximize `maxCol`). Ties: identical (min, max) points do not
    * dominate each other — all survive. Input columns are preserved.
    * Rows with NULL in either dimension are EXCLUDED up front —
    * dominance is undefined for them (an implicit join/predicate drop
    * would lose them silently; the explicit filter makes it a
    * documented contract instead).
    */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val defined = df.filter(col(minCol).isNotNull && col(maxCol).isNotNull)
    // unpartitioned window: BOUNDED — runs over the groupBy(minCol)
    // collapse below (one row per distinct minCol value; callers pass
    // bucketed/score-grid dimensions), never over `df` itself
    val w = Window.orderBy(col(minCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val perKey = defined.groupBy(col(minCol))
      .agg(max(col(maxCol)).as("__mmax"))
      .withColumn("__strict_prefix", max(col("__mmax")).over(w))
    defined.join(perKey, minCol)
      .filter((col("__strict_prefix").isNull ||
          col("__strict_prefix") < col(maxCol)) &&
        col("__mmax") <= col(maxCol))
      .drop("__mmax", "__strict_prefix")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff (change-data capture between two table states): which
  * keys were added, removed, or changed between an `old` and a `new`
  * snapshot — the reconciliation step behind incremental syncs, audit
  * reports, and "what did this backfill touch?".
  *
  * One full-outer equi-join on the key (the natural co-partitioning —
  * with both snapshots bucketed on the key it is exchange-free, see
  * [[Layout]]), change detection via null-safe comparison of the
  * compared columns packed into one struct — no N-way OR of per-column
  * inequalities, and nulls inside values compare correctly.
  */
object Diff {

  /** @param compareCols columns whose change makes a row "changed";
    *                    must exist in both snapshots */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    def pack(df: DataFrame, side: String) = df.select(
      keys.map(col) :+
        struct(compareCols.map(col): _*).as(s"__v_$side") :+
        lit(1).as(s"__present_$side"): _*)
    pack(oldDf, "old").join(pack(newDf, "new"), keys, "full_outer")
      .select(keys.map(col) :+
        when(col("__present_old").isNull, lit("added"))
          .when(col("__present_new").isNull, lit("removed"))
          .when(!(col("__v_old") <=> col("__v_new")), lit("changed"))
          .otherwise(lit("unchanged")).as("change"): _*)
      .filter(col("change") =!= "unchanged")
  }
}

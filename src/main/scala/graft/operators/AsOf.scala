package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the latest
  * right row with `right.ts <= left.ts` for the same key — the feature
  * lookup every training pipeline needs (label events joined to the
  * most recent feature snapshot) and one Spark has no built-in for.
  *
  * Scale shape: NOT a range cross-join and NOT a per-key loop. Both
  * sides are tagged, unioned, and shuffled ONCE on the key; one ordered
  * window pass carries the last non-null right payload forward, and the
  * left rows are peeled back off. Cost is a single hash exchange plus a
  * per-key sort — the same as one groupBy over the combined inputs, at
  * any scale. Equal timestamps count as matches (right sorts before
  * left at the same instant).
  *
  * Determinism: requires (keys, tsCol) unique on the right (true for
  * event streams with unique event ids; dedupe first otherwise). The
  * matched right row is ATOMIC: all payload columns come from the same
  * right row (carried as one struct), so a null in one payload column
  * of the match stays null — it never mixes values from older rows.
  * An all-null payload block means "no match yet".
  */
object AsOf {

  /** @param leftCols  left payload columns carried through
    * @param rightCols right payload columns attached as `prefix+name`
    *                  from the as-of match (all null ⇔ no match yet)
    * @param direction "backward" (latest right at-or-before, the
    *                  default) or "forward" (earliest right
    *                  at-or-after) — the forward form is the same
    *                  single-shuffle window pass over a descending
    *                  timestamp order
    * @param toleranceSeconds maximum |left.ts − match.ts| for a match
    *                  to count (pandas merge_asof tolerance — the
    *                  feature-staleness bound every training join
    *                  needs); a match further away degrades to
    *                  no-match (all-null payload). None = unbounded.
    *                  Applied per-row AFTER the window pass — no extra
    *                  shuffle. For a TimestampType ts column the unit
    *                  is SECONDS (measured microsecond-exact via
    *                  unix_micros); for an integral epoch column
    *                  (long/int) the unit is the COLUMN'S OWN — the
    *                  pandas convention, where tolerance takes the
    *                  dtype's units. Other ts types (double, string)
    *                  fail loudly: exact staleness arithmetic needs an
    *                  exact representation. The untolerated join stays
    *                  type-generic (ordering-only).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, leftCols: Seq[String], rightCols: Seq[String],
               prefix: String = "m_",
               direction: String = "backward",
               toleranceSeconds: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val tsType = left.schema(tsCol).dataType
    val tsIsTimestamp = tsType == org.apache.spark.sql.types.TimestampType
    val tsIsIntegral = tsType == org.apache.spark.sql.types.LongType ||
      tsType == org.apache.spark.sql.types.IntegerType
    require(toleranceSeconds.isEmpty || tsIsTimestamp || tsIsIntegral,
      "tolerance requires a TimestampType or integral epoch ts column " +
        s"(got ${tsType.simpleString}); exact staleness arithmetic " +
        "needs an exact representation — cast or omit tolerance")
    // Same loud contract for the right side: a long left vs timestamp
    // right would otherwise pass here and die inside the union/struct
    // build with a far less diagnostic error.
    require(toleranceSeconds.isEmpty ||
      right.schema(tsCol).dataType == tsType,
      s"tolerance requires both sides' $tsCol to have the same type; " +
        s"left is ${tsType.simpleString}, right is " +
        s"${right.schema(tsCol).dataType.simpleString} — cast one side")
    require(!rightCols.contains("__mts"),
      "rightCols may not contain the reserved name __mts (it would " +
        "collide with the injected match-timestamp struct field)")
    val keyCols = keys.map(col)
    // The right payload travels as ONE struct so the as-of match is
    // row-atomic (never a mix of columns from different right rows).
    // Field 0 is the matched right row's own timestamp (needed for the
    // tolerance check); payload fields follow.
    val matchType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__mts",
        right.schema(tsCol).dataType) +: rightCols.map(c => right.schema(c)))
    val l = left.select(
      keyCols ++ Seq(col(tsCol).as("__ts"), lit(1).as("__side")) ++
        leftCols.map(col) :+
        lit(null).cast(matchType).as("__m"): _*)
    val r = right.select(
      keyCols ++ Seq(col(tsCol).as("__ts"), lit(0).as("__side")) ++
        leftCols.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(tsCol).as("__mts") +: rightCols.map(col): _*).as("__m"): _*)
    val tsOrd =
      if (direction == "backward") col("__ts").asc else col("__ts").desc
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(tsOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.union(r).select(
      keyCols ++ Seq(col("__ts"), col("__side")) ++ leftCols.map(col) :+
        last(col("__m"), ignoreNulls = true).over(w).as("__m"): _*)
    val bounded = toleranceSeconds match {
      case None => col("__m")
      case Some(t) =>
        // by construction the match is at-or-before (backward) /
        // at-or-after (forward), so one absolute difference covers
        // both; microsecond-exact on timestamps (a seconds floor
        // would admit matches up to ~1s beyond the bound on
        // sub-second data), column-unit-exact on integral epochs
        val (staleness, bound) =
          if (tsIsTimestamp)
            (abs(unix_micros(col("__ts")) -
              unix_micros(col("__m").getField("__mts"))), t * 1000000L)
          else
            (abs(col("__ts").cast("long") -
              col("__m").getField("__mts").cast("long")), t)
        when(col("__m").isNotNull && staleness <= bound, col("__m"))
          .otherwise(lit(null).cast(matchType))
    }
    carried.filter(col("__side") === 1)
      .select(
        keyCols ++ Seq(col("__ts").as(tsCol)) ++ leftCols.map(col) :+
          bounded.as("__m"): _*)
      .select(
        keyCols ++ Seq(col(tsCol)) ++ leftCols.map(col) ++
          rightCols.map(c => col("__m").getField(c).as(prefix + c)): _*)
  }
}

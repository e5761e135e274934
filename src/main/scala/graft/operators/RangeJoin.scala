package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-range join: left rows paired with right rows of the same key
  * whose timestamp falls in `[left.ts + loSeconds, left.ts + hiSeconds]`
  * ("clicks in the 30 minutes before each purchase", sensor readings
  * around an alarm, …).
  *
  * Scale shape: NOT a theta-join (which Spark executes as a cartesian
  * per key) — time is bucketed at the window span, the right side keys
  * each row to its ONE bucket, the left side probes exactly TWO
  * consecutive buckets (the span equals the bucket width, so the
  * window can straddle at most one boundary), and the join is a plain
  * equi-join on (keys, bucket) followed by the exact interval filter.
  * Candidates per left row are bounded by the key's density in a
  * 2-span slice of time, and every pair is produced exactly once (the
  * two probed buckets are distinct).
  *
  * Bucketing is integer arithmetic on epoch microseconds (`div`) —
  * no float rounding at bucket boundaries, and replicable verbatim in
  * portable SQL.
  */
object RangeJoin {

  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                tsCol: String, loSeconds: Long, hiSeconds: Long,
                leftCols: Seq[String], rightCols: Seq[String],
                prefix: String = "r_"): DataFrame = {
    require(hiSeconds > loSeconds, "window must have positive span")
    val loUs = loSeconds * 1000000L
    val hiUs = hiSeconds * 1000000L
    val w = hiUs - loUs
    val keyCols = keys.map(col)
    val l = left.select(
        keyCols ++ Seq(unix_micros(col(tsCol)).as("__lus")) ++
          leftCols.map(col): _*)
      .withColumn("__b0", expr(s"(__lus + (${loUs}L)) div ${w}L"))
      .withColumn("__bucket", explode(sequence(col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val r = right.select(
        keyCols ++ Seq(unix_micros(col(tsCol)).as("__rus")) ++
          rightCols.map(c => col(c).as(prefix + c)): _*)
      .withColumn("__bucket", expr(s"__rus div ${w}L"))
    l.join(r, keys :+ "__bucket")
      .filter(col("__rus") >= col("__lus") + loUs &&
              col("__rus") <= col("__lus") + hiUs)
      .withColumn(prefix + "offset_sec",
        (col("__rus") - col("__lus")) / 1000000.0)
      .drop("__bucket", "__lus", "__rus")
  }

  /** Interval-OVERLAP join: left intervals `[lo, hi]` paired with
    * same-key right intervals that overlap (`l.lo ≤ r.hi ∧ r.lo ≤
    * l.hi`) — meeting/session/outage intersection queries.
    *
    * Scale shape: each interval explodes to the time buckets it spans
    * (choose `bucketSeconds` ≥ the typical span so that is ~2), the
    * join is a plain equi-join on (keys, bucket), and a pair sharing
    * several buckets is kept ONLY at the first bucket both intervals
    * cover (`greatest` of the two start buckets — a pure predicate, so
    * dedup costs no extra shuffle). Exact overlap then filters
    * bucket-level false positives. Integer epoch-micros arithmetic
    * throughout, replicable verbatim in SQL.
    */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                  loCol: String, hiCol: String, bucketSeconds: Long,
                  leftCols: Seq[String], rightCols: Seq[String],
                  prefix: String = "r_"): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val w = bucketSeconds * 1000000L
    val keyCols = keys.map(col)
    def side(df: DataFrame, lo: String, hi: String,
             payload: Seq[org.apache.spark.sql.Column]) =
      df.select(keyCols ++ Seq(unix_micros(col(loCol)).as(lo),
          unix_micros(col(hiCol)).as(hi)) ++ payload: _*)
        .withColumn("__bucket",
          explode(sequence(expr(s"$lo div ${w}L"), expr(s"$hi div ${w}L"))))
    val l = side(left, "__llo", "__lhi", leftCols.map(col))
    val r = side(right, "__rlo", "__rhi",
      rightCols.map(c => col(c).as(prefix + c)))
    l.join(r, keys :+ "__bucket")
      .filter(col("__llo") <= col("__rhi") && col("__rlo") <= col("__lhi"))
      .filter(col("__bucket") ===
        greatest(expr(s"__llo div ${w}L"), expr(s"__rlo div ${w}L")))
      .drop("__bucket", "__llo", "__lhi", "__rlo", "__rhi")
  }
}

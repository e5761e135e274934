package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, RangeJoin}

/** As-of and range joins: boundary inclusion, no-match nulls, pair
  * uniqueness across bucket boundaries.
  */
class AsOfSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def evdf(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.toSeq.map { case (id, t, v) => (id, ts(t), 1L, v) }
      .toDF("event_id", "ts", "user_id", "value")
  }

  test("asOfJoin: latest at-or-before wins; unmatched left gets nulls") {
    val left = evdf(
      (10L, "2024-01-01 09:00:00", 0.0), // before any right row → null
      (11L, "2024-01-01 10:00:00", 0.0), // ties right row 2 exactly → <=
      (12L, "2024-01-01 12:00:00", 0.0)) // latest prior is row 3
    val right = evdf(
      (1L, "2024-01-01 09:30:00", 1.5),
      (2L, "2024-01-01 10:00:00", 2.5),
      (3L, "2024-01-01 11:00:00", 3.5))
    val got = AsOf.asOfJoin(left, right, Seq("user_id"), "ts",
        leftCols = Seq("event_id"), rightCols = Seq("event_id", "value"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("m_event_id")),
         Option(r.getAs[java.lang.Double]("m_value")))).toMap
    assert(got(10L) === (None, None))
    assert(got(11L) === (Some(2L), Some(2.5)))
    assert(got(12L) === (Some(3L), Some(3.5)))
  }

  test("asOfJoin: keys partition the timeline") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1L),
                   (2L, ts("2024-01-01 10:00:00"), 2L))
      .toDF("event_id", "ts", "user_id")
    val right = Seq((9L, ts("2024-01-01 09:00:00"), 2L))
      .toDF("event_id", "ts", "user_id")
    val got = AsOf.asOfJoin(left, right, Seq("user_id"), "ts",
        leftCols = Seq("event_id"), rightCols = Seq("event_id"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("m_event_id"))).toMap
    assert(got(1L) === None)      // user 1 has no right rows
    assert(got(2L) === Some(9L))  // user 2's match isn't leaked to user 1
  }

  test("asOfJoin forward: earliest at-or-after wins; past rows ignored") {
    val left = evdf(
      (10L, "2024-01-01 10:00:00", 0.0), // next right is row 2 (equal ts)
      (11L, "2024-01-01 11:30:00", 0.0)) // nothing after → nulls
    val right = evdf(
      (1L, "2024-01-01 09:30:00", 1.5),  // in the past — never matches fwd
      (2L, "2024-01-01 10:00:00", 2.5),
      (3L, "2024-01-01 11:00:00", 3.5))
    val got = AsOf.asOfJoin(left, right, Seq("user_id"), "ts",
        leftCols = Seq("event_id"), rightCols = Seq("event_id"),
        direction = "forward")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("m_event_id"))).toMap
    assert(got(10L) === Some(2L)) // equal timestamp counts (at-or-after)
    assert(got(11L) === None)
  }

  test("asOfJoin tolerance: stale matches degrade to no-match") {
    val left = evdf(
      (10L, "2024-01-01 10:10:00", 0.0), // match 10 min old → kept
      (11L, "2024-01-01 13:00:00", 0.0)) // match 3 h old → nulled
    val right = evdf(
      (1L, "2024-01-01 10:00:00", 1.5))
    val got = AsOf.asOfJoin(left, right, Seq("user_id"), "ts",
        leftCols = Seq("event_id"), rightCols = Seq("event_id", "value"),
        toleranceSeconds = Some(3600L))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("m_event_id"))).toMap
    assert(got(10L) === Some(1L))
    assert(got(11L) === None)
  }

  test("rangeJoin: inclusive bounds, bucket straddling, each pair once") {
    // window: [-60s, 0] before each left row; bucket width = 60s —
    // right rows sit at the exact bounds and across a bucket boundary
    val left = evdf((100L, "2024-01-01 10:01:00", 0.0))
    val right = evdf(
      (1L, "2024-01-01 10:00:00", 0.0),  // exactly lo → included
      (2L, "2024-01-01 10:00:30", 0.0),  // strictly inside, earlier bucket
      (3L, "2024-01-01 10:01:00", 0.0),  // exactly hi → included
      (4L, "2024-01-01 09:59:59", 0.0),  // 1s outside → excluded
      (5L, "2024-01-01 10:01:01", 0.0))  // 1s after → excluded
    val got = RangeJoin.rangeJoin(left, right, Seq("user_id"), "ts",
        loSeconds = -60L, hiSeconds = 0L,
        leftCols = Seq("event_id"), rightCols = Seq("event_id"))
      .collect().map(r => (r.getAs[Long]("r_event_id"),
        r.getAs[Double]("r_offset_sec")))
    assert(got.map(_._1).sorted.toSeq === Seq(1L, 2L, 3L)) // once each
    assert(got.toMap === Map(1L -> -60.0, 2L -> -30.0, 3L -> 0.0))
  }
}

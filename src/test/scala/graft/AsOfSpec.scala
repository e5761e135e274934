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

  test("asOfJoin tolerance: 7-day horizon boundary is exact and order-blind") {
    // the feature-staleness horizon a training join actually uses:
    // matches EXACTLY 7 days old are kept (inclusive bound), one
    // second past degrade to no-match — and the outcome must not
    // depend on input arrival order (the window pass sorts by event
    // time, so a shuffled history replays identically)
    val week = 7L * 24 * 3600
    val left = evdf(
      (10L, "2024-01-08 10:00:00", 0.0), // exactly 7 days after r1 → kept
      (11L, "2024-01-08 10:00:01", 0.0), // 7 days + 1 s after r1 → nulled
      (12L, "2024-01-15 12:00:00", 0.0)) // 7 days + 2 h after r2 → nulled
    val right = evdf(
      (1L, "2024-01-01 10:00:00", 1.5),
      (2L, "2024-01-08 10:00:00", 2.5))
    // r2 is at-or-before rows 11/12 too, so 11 matches r2 (1 s stale —
    // kept); 12's only candidate is r2 at 7 d 2 h — degraded
    def run(l: org.apache.spark.sql.DataFrame) =
      AsOf.asOfJoin(l, right, Seq("user_id"), "ts",
          leftCols = Seq("event_id"), rightCols = Seq("event_id"),
          toleranceSeconds = Some(week))
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("m_event_id"))).toMap
    val expected = Map(10L -> Some(2L), 11L -> Some(2L), 12L -> None)
    // 10 ties r2's own timestamp exactly → r2 (latest at-or-before)
    assert(run(left) === expected)
    // shuffled arrival order — identical outcome
    assert(run(left.orderBy(org.apache.spark.sql.functions.rand(42))) ===
      expected)
    // isolate the exact-boundary degrade: only r1 present → 10 keeps
    // its exactly-7-day match, 11 (1 s past) and 12 degrade
    val gotR1 = AsOf.asOfJoin(left, right.filter(col("event_id") === 1L),
        Seq("user_id"), "ts",
        leftCols = Seq("event_id"), rightCols = Seq("event_id"),
        toleranceSeconds = Some(week))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("m_event_id"))).toMap
    assert(gotR1 === Map(10L -> Some(1L), 11L -> None, 12L -> None))
  }

  test("asOfJoin tolerance on integral epochs: column units, exact bound") {
    import spark.implicits._
    // pandas convention: tolerance takes the column's own units
    val l = Seq((10L, 100L), (11L, 161L)).toDF("event_id", "ts")
    val r = Seq((1L, 95L), (2L, 100L)).toDF("event_id", "ts")
    val got = AsOf.asOfJoin(l, r, Seq.empty, "ts",
        leftCols = Seq("event_id"), rightCols = Seq("event_id"),
        toleranceSeconds = Some(60L))
      .collect().map(row => row.getAs[Long]("event_id") ->
        Option(row.getAs[java.lang.Long]("m_event_id"))).toMap
    // 10 matches r2 at distance 0; 11's latest-at-or-before is r2 at
    // distance exactly 61 > 60 → degraded (the bound is inclusive at
    // 60, so a 160-ts row would have kept it)
    assert(got === Map(10L -> Some(2L), 11L -> None))
    val exact = AsOf.asOfJoin(Seq((12L, 160L)).toDF("event_id", "ts"), r,
        Seq.empty, "ts", leftCols = Seq("event_id"),
        rightCols = Seq("event_id"), toleranceSeconds = Some(60L))
      .collect().map(row => Option(row.getAs[java.lang.Long]("m_event_id")))
    assert(exact.toSeq === Seq(Some(2L)))
  }

  test("asOfJoin tolerance: inexact ts column (double) fails loudly") {
    import spark.implicits._
    val l = Seq((1L, 100.5)).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(l, l, Seq.empty, "ts",
        leftCols = Seq("event_id"), rightCols = Seq("event_id"),
        toleranceSeconds = Some(60L))
    }
    assert(e.getMessage.contains("exact"))
  }

  test("asOfJoin tolerance: mismatched left/right ts types fail loudly") {
    import spark.implicits._
    // long left vs timestamp right previously passed the left-only type
    // check and died deep inside the union/struct build; now it names
    // both types up front
    val l = Seq((1L, 100L)).toDF("event_id", "ts")
    val r = Seq((2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(l, r, Seq.empty, "ts",
        leftCols = Seq("event_id"), rightCols = Seq("event_id"),
        toleranceSeconds = Some(60L))
    }
    assert(e.getMessage.contains("same type") &&
      e.getMessage.contains("bigint") && e.getMessage.contains("timestamp"))
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

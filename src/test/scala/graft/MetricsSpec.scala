package graft

import org.apache.spark.sql.functions._

import graft.operators.Metrics

/** Runtime counterpart to PlanSpec's plan-string guards: the listener
  * proves zero bytes actually crossed a shuffle for map-only plans,
  * and that aggregations really combine map-side before the exchange.
  */
class MetricsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("map-only query moves zero shuffle bytes at runtime") {
    // the noop sink executes the full plan without count()'s own
    // final-aggregation exchange polluting the measurement
    val (_, m) = Metrics.measure(spark) {
      SparkEntry.queries("t_chunk_overlap")(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    assert(m.shuffleWriteBytes === 0L, m)
    assert(m.inputRecordsRead > 0L)
  }

  test("group-by shuffles only the combined partials, not the input rows") {
    val (_, m) = Metrics.measure(spark) {
      Tables.t(spark, dir, "lineitem")
        .groupBy("l_returnflag").agg(count(lit(1))).count()
    }
    assert(m.shuffleWriteBytes > 0L)
    // partial aggregation: what crosses the wire is per-partition
    // per-group rows (a handful), not the ~6k input rows
    assert(m.shuffleRecordsWritten < 100L, m)
    assert(m.inputRecordsRead >= 6000L)
  }

  test("broadcast dimension join shuffles nothing for the fact side") {
    val (_, m) = Metrics.measure(spark) {
      Tables.t(spark, dir, "lineitem")
        .join(broadcast(Tables.t(spark, dir, "part")), expr("l_partkey = p_partkey"))
        .count()
    }
    // the count's final agg shuffles a single tiny row per partition;
    // the join itself must not shuffle the fact table
    assert(m.shuffleRecordsWritten <= 64L, m)
  }

  test("signal queries shuffle the bounded series, never per-event rows") {
    // sf0.1 on purpose: 100k events vs 720 hourly buckets — at
    // sf0.001 the partial-agg record count wouldn't separate the two
    // regimes. The CUSUM window runs on the hourly series; what
    // crosses the wire is per-partition per-hour partials (≤ 32·720)
    // plus the 720-row single-partition exchange — if a refactor ever
    // pushed raw events into the window, this jumps to ≥ 100k.
    val (rows, m) = Metrics.measure(spark) {
      SparkEntry.queries("e_cusum_changepoint")(
        spark, "/root/testdata/sf0.1").collect()
    }
    assert(rows.length === 720)
    assert(m.inputRecordsRead >= 100000L, m) // really scanned the events
    assert(m.shuffleRecordsWritten < 50000L, m)
  }
}

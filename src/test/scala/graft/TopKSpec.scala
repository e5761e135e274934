package graft

import org.apache.spark.sql.functions._
import graft.operators.TopK

/** Bounded top-k aggregate: semantics (vs window row_number) and plan
  * shape (partial ObjectHashAggregate, no Window exchange-and-sort). */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    // (group, id, score) — group 1 has a tie on score (ids break it),
    // group 2 has fewer rows than k, group 3 exercises negative scores
    (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 7.0), (1L, 13L, 1.0),
    (2L, 20L, 2.0),
    (3L, 30L, -1.0), (3L, 31L, -3.0), (3L, 32L, -2.0), (3L, 33L, 0.0)
  ).toDF("g", "id", "score")

  test("perGroup matches window row_number semantics incl. ties") {
    val got = TopK.perGroup(fixture, col("g"), col("score"), col("id"), 3)
      .as[(Long, Int, Long, Double)].collect().toSet
    val want = Set(
      (1L, 1, 12L, 7.0), (1L, 2, 10L, 5.0), (1L, 3, 11L, 5.0),
      (2L, 1, 20L, 2.0),
      (3L, 1, 33L, 0.0), (3L, 2, 30L, -1.0), (3L, 3, 32L, -2.0))
    assert(got === want)
  }

  test("result is independent of partitioning (merge order)") {
    val base = TopK.perGroup(fixture, col("g"), col("score"), col("id"), 2)
      .collect().map(_.toString).sorted.toSeq
    for (n <- Seq(1, 3, 7)) {
      val re = TopK.perGroup(fixture.repartition(n), col("g"),
        col("score"), col("id"), 2).collect().map(_.toString).sorted.toSeq
      assert(re === base, s"partitions=$n")
    }
  }

  test("plan is a partial ObjectHashAggregate, not a Window sort") {
    val plan = TopK.perGroup(fixture, col("g"), col("score"), col("id"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    // map-side partial before the exchange — the property that keeps the
    // shuffle ≤ k rows per (group, task) at 100 TB
    assert(plan.contains("isDistinct=false") || plan.contains("partial_"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("agg reduce/merge keep the buffer bounded and sorted") {
    val agg = new TopK.TopKAgg(2)
    val a = TopK.ScoredId(1.0, 1); val b = TopK.ScoredId(9.0, 2)
    val c = TopK.ScoredId(5.0, 3); val d = TopK.ScoredId(9.0, 1)
    val buf = Seq(a, b, c, d).foldLeft(agg.zero)(agg.reduce)
    assert(buf === List(TopK.ScoredId(9.0, 1), TopK.ScoredId(9.0, 2)))
    val merged = agg.merge(buf, List(TopK.ScoredId(10.0, 7)))
    assert(merged === List(TopK.ScoredId(10.0, 7), TopK.ScoredId(9.0, 1)))
  }
}

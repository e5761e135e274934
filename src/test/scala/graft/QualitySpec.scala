package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

/** Quality metrics: values on a fixture with known nulls/dupes/orphans,
  * and the scan-once plan property (one Aggregate, no join). */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("a"), 2.0), (2L, None, -1.0), (3L, Some("c"), 4.0),
    (3L, Some("d"), 5.0)
  ).toDF("id", "tag", "v")

  test("metrics computes completeness/uniqueness/profile/assertions") {
    val m = Quality.metrics(fixture,
      completenessCols = Seq("tag"),
      uniquenessCols = Seq("id"),
      numericCols = Seq("v"),
      assertions = Seq("v_non_negative" -> (min(col("v")) >= lit(0))))
      .as[(String, Double)].collect().toMap
    assert(m("completeness_tag") === 0.75)
    assert(m("uniqueness_id") === 0.75)
    assert(m("min_v") === -1.0 && m("max_v") === 5.0 && m("mean_v") === 2.5)
    assert(m("v_non_negative") === 0.0)
  }

  test("metrics is one aggregation pass — no join, single scan") {
    val qe = Quality.metrics(fixture, completenessCols = Seq("tag"),
      uniquenessCols = Seq("id"), numericCols = Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!qe.contains("Join"), qe)
    assert("Scan ".r.findAllIn(qe).length <= 1, qe)
  }

  test("assertions over empty/all-null input report 0.0, not NULL") {
    val empty = fixture.filter(col("id") < 0)
    val m = Quality.metrics(empty,
      assertions = Seq("v_non_negative" -> (min(col("v")) >= lit(0))))
      .as[(String, Double)].collect().toMap
    assert(m("v_non_negative") === 0.0)
  }

  test("referentialIntegrity counts orphans, nulls are not orphans") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val m = Quality.referentialIntegrity(child, "fk", parent, "pk", "t")
      .as[(String, Double)].collect().toMap
    assert(m("orphans_t") === 1.0)
    assert(m("orphan_ratio_t") === 0.25)
  }
}

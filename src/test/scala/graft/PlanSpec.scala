package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-quality regression guards: the properties SCALE.md claims —
  * pushdown, pruning, broadcast dimension joins, TakeOrderedAndProject
  * top-k — asserted against the actual physical plans so a future
  * refactor can't silently regress them.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(FormattedMode)

  test("filters and projection reach the parquet scan") {
    val p = planOf("q_filter_pushdown")
    assert(p.contains("PushedFilters") && p.contains("In(p_brand"))
    assert(p.contains("ReadSchema: struct<p_partkey"))
    // untouched columns (p_name, p_retailprice) are pruned from the scan
    assert(!p.contains("p_retailprice"))
  }

  test("q3: dimension join broadcasts, date filters pushed") {
    val p = planOf("q3_shipping_priority")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("GreaterThan(l_shipdate"))
  }

  test("top-k compiles to TakeOrderedAndProject (no global sort)") {
    assert(planOf("q2_top_orders").contains("TakeOrderedAndProject"))
  }

  test("similarity top-k broadcasts the query side") {
    val p = planOf("s_cosine_topk")
    assert(p.contains("Broadcast"))
    // the rank exchange carries only narrow columns, not embeddings
    assert(!p.contains("hashpartitioning(q_id") ||
      !p.substring(p.indexOf("hashpartitioning(q_id")).take(200).contains("qv"))
  }

  test("semi/anti joins stay joins (no fallback to cartesian)") {
    assert(planOf("o9_semi_join").contains("LeftSemi"))
    assert(planOf("o9_anti_join").contains("LeftAnti"))
  }
}

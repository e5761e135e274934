package graft

import graft.operators.Graph

/** BFS hop labelling: chain distances, undirectedness, hop bound,
  * multi-seed minimum. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // chain 1-2-3-4-5, branch 3-6, island 8-9
  private def edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (6L, 3L), (8L, 9L)).toDF("src", "dst")

  test("single-seed BFS labels min hops and stops at maxHops") {
    val got = Graph.bfsHops(edges, Seq(1L).toDF("id"), maxHops = 3)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 6L -> 3))
    // 5 is 4 hops away, islands unreachable — both absent
  }

  test("edge direction does not matter (6->3 reaches 6 from 1)") {
    val got = Graph.bfsHops(edges, Seq(6L).toDF("id"), maxHops = 2)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(6L -> 0, 3L -> 1, 2L -> 2, 4L -> 2))
  }

  test("multi-seed takes the minimum distance over seeds") {
    val got = Graph.bfsHops(edges, Seq(1L, 5L).toDF("id"), maxHops = 2)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }

  test("maxHops=0 returns just the distinct seeds") {
    val got = Graph.bfsHops(edges, Seq(1L, 1L, 9L).toDF("id"), maxHops = 0)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 9L -> 0))
  }
}

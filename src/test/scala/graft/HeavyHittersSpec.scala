package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

/** Two-phase exact frequent items: Misra–Gries properties + end-to-end
  * equality with the naive groupBy-count plan. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("misraGries keeps at most `capacity` counters and retains items above n/(m+1)") {
    // 60×a, 30×b, 10 singletons (n=100): with capacity 3 every item with
    // count > 100/4 = 25 must survive
    val stream = Seq.fill(60)("a") ++ Seq.fill(30)("b") ++
      (1 to 10).map(i => s"x$i")
    val out = HeavyHitters.misraGries(
      scala.util.Random.shuffle(stream).iterator, 3).toSet
    assert(out.size <= 3)
    assert(out.contains("a") && out.contains("b"))
  }

  test("frequentItems equals the naive exact plan") {
    val df = (Seq.fill(40)("hot") ++ Seq.fill(25)("warm") ++
      (1 to 200).map(i => s"cold$i")).toDF("item").repartition(5)
    val got = HeavyHitters.frequentItems(df, col("item"), minCount = 20,
        capacity = 64, validate = true)
      .as[(String, Long)].collect().toSet
    val naive = df.groupBy("item").count().filter(col("count") >= 20)
      .as[(String, Long)].collect().toSet
    assert(got === naive)
    assert(got === Set(("hot", 40L), ("warm", 25L)))
  }

  test("validate self-heals an undersized capacity to stay exact") {
    // 50 distinct items × 10 copies; capacity=4 alone cannot guarantee
    // minCount=2, so validate must escalate it — and the result must
    // still equal the naive plan exactly
    val df = (1 to 500).map(i => s"t${i % 50}").toDF("item").repartition(4)
    val got = HeavyHitters.frequentItems(df, col("item"), minCount = 2,
        capacity = 4, validate = true)
      .as[(String, Long)].collect().toSet
    val naive = df.groupBy("item").count().filter(col("count") >= 2)
      .as[(String, Long)].collect().toSet
    assert(got === naive && got.size === 50)
  }

  test("null items are excluded by contract") {
    val df = (Seq.fill(30)(Some("a")) ++ Seq.fill(20)(Option.empty[String]))
      .toDF("item")
    val got = HeavyHitters.frequentItems(df, col("item"), minCount = 5,
        capacity = 16, validate = true)
      .as[(String, Long)].collect().toSet
    assert(got === Set(("a", 30L))) // no (null, 20) row
  }
}

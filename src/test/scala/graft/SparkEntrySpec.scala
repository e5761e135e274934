package graft

/** The driver contract itself: entry returns rows, every query has a
  * callable constructor, and oracle keys stay within the query set.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry: flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries; names are well-formed") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphan oracle keys: ${o.diff(q)}")
    assert(q.forall(_.matches("[a-z0-9_]+")))
    // every query constructs a plan without executing (side-effecting
    // ones excluded — they run real file I/O on invocation)
    (q -- SparkEntry.sideEffecting).foreach { name =>
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").schema
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Bloom

/** Bloom prefilter: no false negatives, exact-semi-join equivalence,
  * and the probe actually prunes (sketch works as a filter). */
class BloomSpec extends SparkSpec {

  test("mightContain: every inserted key probes true (no false negatives)") {
    import spark.implicits._
    val keys = (1L to 2000L by 3).toDF("k")
    val bf = Bloom.bloomOf(keys, "k", fpp = 0.05)
    val misses = keys.filter(!Bloom.mightContain(bf, col("k"))).count()
    assert(misses === 0L)
  }

  test("semiJoin == plain left_semi, and the bloom pass prunes absentees") {
    import spark.implicits._
    val big = (1L to 5000L).map(i => (i % 997, i)).toDF("k", "payload")
    val keys = (0L to 996L by 13).toDF("kk")
    val got = Bloom.semiJoin(big, keys, "k", "kk", fpp = 0.01)
      .select("k", "payload").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = big.join(keys, col("k") === col("kk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    // the sketch alone removes most non-members (~fpp survive)
    val bf = Bloom.bloomOf(keys, "kk", fpp = 0.01)
    val survivors = big.filter(Bloom.mightContain(bf, col("k"))).count()
    assert(survivors < want.size + 500, s"bloom barely pruned: $survivors")
  }
}

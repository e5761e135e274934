package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic hash sampling: stability, stratum rates, growth
  * invariance.
  */
class SamplingSpec extends SparkSpec {

  test("hashSample: deterministic, rate ≈ fraction, stable under growth") {
    import spark.implicits._
    val ids = (1L to 4000L).toDF("id")
    val a = Sampling.hashSample(ids, "id", 0.25).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids, "id", 0.25).collect().map(_.getLong(0)).toSet
    assert(a === b) // pure function of the row
    assert(math.abs(a.size / 4000.0 - 0.25) < 0.05)
    // membership of existing rows never changes when the corpus grows
    val grown = Sampling.hashSample((1L to 8000L).toDF("id"), "id", 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(grown.filter(_ <= 4000L) === a)
  }

  test("stratifiedHashSample: per-stratum rates and default") {
    import spark.implicits._
    val df = (1L to 3000L).map(i =>
      (i, if (i % 3 == 0) "A" else if (i % 3 == 1) "B" else "C"))
      .toDF("id", "stratum")
    val kept = Sampling.stratifiedHashSample(df, "id", "stratum",
        Map("A" -> 0.5, "B" -> 0.125), defaultFraction = 0.0)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(kept("A") / 1000.0 - 0.5) < 0.08)
    assert(math.abs(kept("B") / 1000.0 - 0.125) < 0.08)
    assert(!kept.contains("C")) // default 0 drops the stratum entirely
  }
}

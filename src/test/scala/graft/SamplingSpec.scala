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

  test("hashSplit: exhaustive, disjoint, stable under corpus growth") {
    import spark.implicits._
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val small = Sampling.hashSplit((1L to 2000L).toDF("id"), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small.size === 2000) // every row labeled exactly once
    val counts = small.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") / 2000.0 - 0.8) < 0.05)
    assert(counts.keySet === Set("train", "val", "test"))
    // growing the corpus never relabels an existing row (no leakage)
    val grown = Sampling.hashSplit((1L to 4000L).toDF("id"), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1L to 2000L).forall(i => grown(i) === small(i)))
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(small.keys.toSeq.toDF("id"), "id",
        Seq("a" -> 0.5, "b" -> 0.3)) // fractions must sum to 1
    }
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

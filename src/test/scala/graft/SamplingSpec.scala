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

  test("quotaCap: per-group cap enforced, selection deterministic and stable") {
    import spark.implicits._
    val df = (1L to 900L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val kept = Sampling.quotaCap(df, "id", "grp", quota = 10)
    val byGrp = kept.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp === Map("g0" -> 10L, "g1" -> 10L, "g2" -> 10L))
    // deterministic: same rows every run
    val ids1 = kept.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.quotaCap(df, "id", "grp", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
    // under-quota groups are kept whole
    val small = Seq((1L, "x"), (2L, "x")).toDF("id", "grp")
    assert(Sampling.quotaCap(small, "id", "grp", 10).count() === 2)
  }

  test("weightedMix: realized mix matches ratios at the feasible total") {
    import spark.implicits._
    // availability 100/100/10; ratios 0.5/0.3/0.2 → total bound by
    // src2: min(200, 333, 50) = 50 → quotas 25/15/10
    val df = ((1L to 100L).map(i => (i, "a")) ++
      (101L to 200L).map(i => (i, "b")) ++
      (201L to 210L).map(i => (i, "c")) ++
      (211L to 220L).map(i => (i, "excluded"))).toDF("id", "src")
    val mixed = Sampling.weightedMix(df, "id", "src",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    val counts = mixed.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("a" -> 25L, "b" -> 15L, "c" -> 10L))
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

  test("weightedSample: inclusion tracks weight, draw is deterministic") {
    import spark.implicits._
    // ids 0-99: first half weight 50, second half weight 1
    val df = (0 until 100).map(i => (i.toLong, if (i < 50) 50.0 else 1.0))
      .toDF("id", "w")
    val pick = Sampling.weightedSample(df, "id", "w", k = 20)
    val ids = pick.select("id").as[Long].collect().toSet
    assert(ids.size === 20)
    // E-S keys: ln(u)/50 vs ln(u)/1 — heavy rows dominate the top-20
    assert(ids.count(_ < 50) >= 17)
    // pure function of (id, w): re-evaluation returns the same set
    val again = Sampling.weightedSample(df, "id", "w", k = 20)
      .select("id").as[Long].collect().toSet
    assert(again === ids)
    // zero/negative weights are never sampled
    val z = Sampling.weightedSample(
      df.withColumn("w", when(col("id") < 99, lit(0.0)).otherwise(lit(2.0))),
      "id", "w", k = 5).select("id").as[Long].collect().toSeq
    assert(z === Seq(99L))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

/** Profile operators: exact quantiles (interpolation, partition
  * invariance) and the numeric profile pass. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("exactQuantiles interpolates like quantile_cont") {
    // values 10,20,30,40 (n=4): q50 pos=1.5 → 25.0; q25 pos=0.75 → 17.5
    val df = Seq(40.0, 10.0, 30.0, 20.0).toDF("v")
    val got = Profile.exactQuantiles(df, "v", Seq(0.25, 0.5, 1.0))
      .as[(Double, Double)].collect().toMap
    assert(got(0.25) === 17.5)
    assert(got(0.5) === 25.0)
    assert(got(1.0) === 40.0)
  }

  test("exactQuantiles ignores nulls and survives repartitioning") {
    val df = (1 to 101).map(i => Some(i.toDouble))
      .union(Seq(None, None)).toDF("v")
    for (n <- Seq(1, 7)) {
      val got = Profile.exactQuantiles(df.repartition(n), "v", Seq(0.5))
        .as[(Double, Double)].collect().toMap
      assert(got(0.5) === 51.0, s"partitions=$n")
    }
  }

  test("numericProfile: null/distinct/range per column in one pass") {
    val df = Seq((1.0, Some(2.0)), (1.0, None), (3.0, Some(5.0)))
      .toDF("a", "b")
    val got = Profile.numericProfile(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got("a") === ((3L, 0L, 2L)))
    assert(got("b") === ((3L, 1L, 2L)))
  }
}

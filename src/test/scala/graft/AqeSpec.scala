package graft

import org.apache.spark.sql.functions._

/** AQE runtime skew handling: with salting (operators.Skew) as the
  * deterministic tool, this guards the OTHER skew lever SCALE.md
  * promises — Spark's adaptive skew-join split, which re-plans the
  * oversized partition at runtime with no code change. */
class AqeSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying ~7 MB of INCOMPRESSIBLE payload (md5-derived
      // — shuffle blocks are lz4'd, a constant pad would vanish) forces
      // a single oversized shuffle partition
      val left = ((1L to 20000L).map(i => (0L, i)) ++ (1L to 200L).map(i => (i, i)))
        .toDF("k", "i")
        .withColumn("payload", concat_ws("",
          (0 to 11).map(j => md5(concat_ws(":", col("k"), col("i"), lit(j)))): _*))
        .drop("i")
      val right = (0L to 200L).toDF("k").withColumn("v", col("k") * 2)
      val joined = left.join(right, "k")
      // execute THIS query execution (count() would build a separate
      // one and leave this plan unadapted), then read the final plan
      assert(joined.collect().length === 20200) // correctness unaffected
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead") && plan.contains("skewed"),
        s"expected a skewed AQEShuffleRead in:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

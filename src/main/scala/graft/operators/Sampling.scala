package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for reproducible dataset curation: rows are
  * assigned to one of 256 buckets by the md5 of their id, and a sample
  * keeps buckets below `round(256·fraction)`. Unlike `df.sample`, the
  * decision is a pure function of the row — stable across runs, Spark
  * versions, partitionings, and engines (the oracle replicates it),
  * and a row's membership never changes when the corpus grows. Pure
  * map-side predicate, pushes to the scan, zero shuffle.
  */
object Sampling {

  /** 256-bucket assignment from the first two hex chars of md5(id). */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 2), 16, 10).cast("int")

  /** Keep ~`fraction` of rows, deterministically (granularity 1/256). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashBucket(col(idCol)) < math.round(fraction * 256).toInt)

  /** Deterministic train/val/test split: cumulative bucket ranges over
    * the same 256-bucket hash, so every row lands in exactly one split,
    * assignment never changes as the corpus grows (no train/test
    * leakage on refresh), and fractions sum to 1 with the remainder in
    * the last split.
    */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val bounds = splits.scanLeft(0)(
      (acc, s) => acc + math.round(s._2 * 256).toInt).tail
    val bucket = hashBucket(col(idCol))
    val label = splits.map(_._1).zip(bounds).init.foldRight(
      lit(splits.last._1): Column) {
      case ((name, hi), acc) => when(bucket < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** Deterministic pseudorandom training order: a stable permutation
    * from md5(salt:id) sort keys. Reproducible across runs and
    * engines (unlike `orderBy(rand())`), re-shuffled by changing the
    * salt (epoch number), and distributed — the global sort is a range
    * exchange, exactly what a training-data writer does before
    * sharding.
    */
  def shuffleOrder(df: DataFrame, idCol: String, salt: String): DataFrame =
    df.withColumn("shuffle_key",
        md5(concat_ws(":", lit(salt), col(idCol).cast("string"))))
      .orderBy(col("shuffle_key"))

  /** Stratified: per-stratum fractions (e.g. downsample boilerplate
    * web text, keep all books), `defaultFraction` for unlisted strata.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
                           fractions: Map[String, Double],
                           defaultFraction: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(
      lit(math.round(defaultFraction * 256).toInt): Column) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum,
          lit(math.round(f * 256).toInt)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < threshold)
  }
}

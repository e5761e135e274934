package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Deterministic per-group rank: md5(id) order within each group —
    * the stable "which rows first" tiebreak quota/mix sampling share. */
  private def groupRank(idCol: String, groupCol: String) =
    row_number().over(Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc))

  /** Per-group quota cap: at most `quota` rows per `groupCol`, chosen
    * deterministically by md5(id) rank — the per-domain cap a web-scale
    * corpus needs so no one domain dominates training. One keyed window;
    * pass a narrow projection and join wide payloads back if the rows
    * carry large columns.
    */
  def quotaCap(df: DataFrame, idCol: String, groupCol: String,
               quota: Int): DataFrame =
    df.withColumn("__rn", groupRank(idCol, groupCol))
      .filter(col("__rn") <= quota).drop("__rn")

  /** Deterministic weighted source mix: the largest total consistent
    * with `ratios` given per-source availability (total = min over
    * sources of count/ratio), realized as the first floor(ratio·total)
    * rows per source in md5(id) order. Sources not in `ratios` are
    * excluded. The per-source counts and quotas are tiny aggregates
    * (broadcast); the only data-sized cost is the per-source rank
    * window — shuffle on the source key once, at any scale.
    */
  def weightedMix(df: DataFrame, idCol: String, sourceCol: String,
                  ratios: Map[String, Double]): DataFrame = {
    require(ratios.nonEmpty && ratios.values.forall(_ > 0),
      "ratios must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val ratioDf = ratios.toSeq.toDF(sourceCol, "__ratio")
    val d = df.filter(col(sourceCol).isin(ratios.keys.toSeq: _*))
    // ratio-listed sources absent from the data must constrain the
    // total to 0 (the only total consistent with the ratios), not be
    // silently dropped — hence ratios LEFT JOIN counts, zero-filled
    val withRatio = broadcast(ratioDf)
      .join(d.groupBy(sourceCol).agg(count(lit(1)).as("__c")),
        Seq(sourceCol), "left")
      .withColumn("__cnt", coalesce(col("__c"), lit(0L))).drop("__c")
    val feasible = withRatio
      .agg(min(floor(col("__cnt") / col("__ratio"))).as("__total"))
    val quota = withRatio.crossJoin(broadcast(feasible))
      .select(col(sourceCol),
        least(col("__cnt"), floor(col("__ratio") * col("__total"))).as("__quota"))
    d.withColumn("__rn", groupRank(idCol, sourceCol))
      .join(broadcast(quota), Seq(sourceCol))
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /** Efraimidis–Spirakis weighted sampling without replacement: each
    * row draws a deterministic uniform u from the first 8 hex chars of
    * md5(id) and the k rows with the largest u^(1/w) win — equivalent
    * (and computed as) the largest ln(u)/w. Inclusion probability is
    * proportional to weight, the standard "sample by quality score"
    * training-mix primitive, yet fully reproducible across runs,
    * engines, and partitionings.
    *
    * Scale: one map-side projection + top-k (TakeOrderedAndProject —
    * per-partition heaps, never a global sort). The selection key is
    * rounded to 6 decimals with an id tiebreak so the chosen set is
    * identical even where engines' ln() differ in ulps.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k > 0)
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(4294967296.0)
    df.filter(col(weightCol) > 0)
      .withColumn("skey", round(log(u) / col(weightCol).cast("double"), 6))
      .orderBy(col("skey").desc, col(idCol).asc)
      .limit(k)
  }

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

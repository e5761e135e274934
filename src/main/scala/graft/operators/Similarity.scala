package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k — the query set is broadcast, so
  * the corpus is scanned once, map-side, with no shuffle of corpus rows;
  * per-query top-k via a window over the (queries × corpus) pair stream.
  * At 100 TB the pair stream is |Q| × |corpus| rows but never
  * materialized: filter + window-rank happens inside the scan stage.
  *
  * Scale path: sign-LSH bucketing — an axis-aligned random-hyperplane
  * code (the sign bit of the first `bits` dimensions). Query and corpus
  * join on the bucket key, cutting candidates ~2^bits-fold; recall is
  * traded via `bits` (multi-probe = flipping bucket bits, not needed at
  * test scale). All expressions are built-ins replicable in the oracle.
  */
object Similarity {

  /** Dot product in double precision, left-to-right accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Sign-LSH bucket key: "1"/"0" per leading dimension's sign. Sign of
    * a float is exact — no cross-engine precision hazard.
    */
  def signBucket(v: Column, bits: Int): Column =
    concat_ws("", transform(slice(v, 1, bits),
      x => when(x >= 0, lit("1")).otherwise(lit("0"))))

  /** Brute-force cosine top-k: for each query row, the k nearest corpus
    * rows (self-pairs excluded), ties broken by corpus id.
    */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"))
    val pairs = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cos")
  }

  /** Sign-LSH ANN top-k: candidates restricted to the query's bucket. */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val pairs = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "bucket", "rank", "n_id", "cos")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, bucketed by
    * sign-LSH so candidate generation is an equi-join (vectors with
    * cosine ≈ 1 share every sign bit almost surely).
    */
  def cosineNearDupPairs(df: DataFrame, threshold: Double, bits: Int,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBucket(col(vecCol), bits).as("bucket"))
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cos", cosine(col("a.v"), col("b.v")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
  }
}

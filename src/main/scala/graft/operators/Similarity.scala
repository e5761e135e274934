package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.VectorExprs

/** Similarity search over an embedding column (array<float>, cast to
  * array<double> at the boundary).
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
  * test scale).
  *
  * Hot-path arithmetic is the native codegen'd
  * [[graft.expressions.DotProduct]]; vector norms are computed ONCE per
  * row before the join, never per candidate pair.
  */
object Similarity {

  /** Dot product in double precision (native codegen expression). */
  def dot(a: Column, b: Column): Column = VectorExprs.dot(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Sign-LSH bucket key: "1"/"0" per leading dimension's sign. Sign of
    * a float is exact — no cross-engine precision hazard.
    */
  def signBucket(v: Column, bits: Int): Column =
    concat_ws("", transform(slice(v, 1, bits),
      x => when(x >= 0, lit("1")).otherwise(lit("0"))))

  /** cos from a precomputed-norm pair: dot/(|a|·|b|) — same expression
    * shape as `cosine`, minus the per-pair norm recompute.
    */
  private def cosPre(av: Column, bv: Column, an: Column, bn: Column): Column =
    dot(av, bv) / (an * bn)

  /** Brute-force cosine top-k: for each query row, the k nearest corpus
    * rows (self-pairs excluded), ties broken by corpus id.
    */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("qn"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("nn"))
    // project BEFORE the window: only (q_id, n_id, cos) crosses the
    // rank exchange, never the 64-dim vectors
    val pairs = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        cosPre(col("qv"), col("nv"), col("qn"), col("nn")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cos")
  }

  /** Sign-LSH ANN top-k: candidates restricted to the query's bucket. */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("qn"),
      signBucket(col(vecCol), bits).as("bucket"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("nn"),
      signBucket(col(vecCol), bits).as("bucket"))
    val pairs = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("bucket"), col("n_id"),
        cosPre(col("qv"), col("nv"), col("qn"), col("nn")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "bucket", "rank", "n_id", "cos")
  }

  /** Multi-probe bucket set: the exact sign bucket plus every
    * single-bit flip — recovers neighbors that fall just across a
    * hyperplane (the classic sign-LSH recall fix). bits+1 probes per
    * query; corpus rows keep ONE bucket, so no result duplication.
    */
  def probeBuckets(v: Column, bits: Int): Column = {
    val flips = (0 until bits).map { f =>
      concat_ws("", transform(slice(v, 1, bits), (x, i) =>
        when(i === f,
          when(x >= 0, lit("0")).otherwise(lit("1")))   // flipped bit
          .otherwise(when(x >= 0, lit("1")).otherwise(lit("0")))))
    }
    array(signBucket(v, bits) +: flips: _*)
  }

  /** Sign-LSH ANN with single-bit multi-probe: the query side explodes
    * into bits+1 probe buckets; candidates = corpus rows in any probe.
    */
  def annTopKMultiProbe(queries: DataFrame, corpus: DataFrame, k: Int,
                        bits: Int, idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("qn"),
      explode(probeBuckets(col(vecCol), bits)).as("bucket"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("nn"),
      signBucket(col(vecCol), bits).as("bucket"))
    val pairs = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        cosPre(col("qv"), col("nv"), col("qn"), col("nn")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cos")
  }

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every
    * vector to its nearest of `nLists` centroids; search probes only
    * the query's list — the candidate set shrinks |corpus|/nLists-fold
    * and the join is an equi-join on the list id, exactly like the
    * sign-LSH path but with data-adaptive buckets (better recall on
    * clustered corpora). `nProbe` > 1 would extend this to the nearest
    * few centroids; at test scale one probe suffices.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nLists: Int,
              seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("nn"),
      array_to_vector(col(vecCol)).as("fv"))
    val model = new KMeans().setK(nLists).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("list").fit(c)
    val cc = model.transform(c).drop("fv")
    val qq = model.transform(
      queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
        sqrt(dot(col(vecCol), col(vecCol))).as("qn"),
        array_to_vector(col(vecCol)).as("fv"))).drop("fv")
    val pairs = cc.join(broadcast(qq), Seq("list"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("list"), col("n_id"),
        cosPre(col("qv"), col("nv"), col("qn"), col("nn")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "list", "rank", "n_id", "cos")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, bucketed by
    * sign-LSH so candidate generation is an equi-join (vectors with
    * cosine ≈ 1 share every sign bit almost surely).
    */
  def cosineNearDupPairs(df: DataFrame, threshold: Double, bits: Int,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(dot(col(vecCol), col(vecCol))).as("nrm"),
      signBucket(col(vecCol), bits).as("bucket"))
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cos", cosPre(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
  }
}

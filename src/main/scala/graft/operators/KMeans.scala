package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the
  * clustering pass under cluster-based curation (DataComp-style
  * cluster-then-filter, SemDedup's cluster stage, domain discovery).
  *
  * Scale shape per iteration (the only shape that survives 100 TB):
  *   - ASSIGN is map-side: centroids are a plan literal (k·dim doubles
  *     broadcast with the closure), each row computes k fold-distances
  *     inside the scan stage — the corpus is never shuffled;
  *   - RECOMPUTE is one keyed aggregation: posexplode to (cid, pos, x)
  *     and groupBy(cid, pos) — k·dim groups regardless of corpus size,
  *     map-side partial combine, then k·dim rows to the driver.
  * Iterations are driver-orchestrated literals, like [[Similarity]]'s
  * IVF centroids — "small model to driver, big data stays put".
  *
  * Determinism (the partition-invariance property SCALE.md §12 audits):
  * inputs are round-9 quantized and centroid component sums run in
  * DECIMAL(28,9) — exact, order-independent — then divide once in
  * double. Distances are left-associated folds over the index order;
  * assignment ties break by lowest centroid id. Bit-identical at any
  * parallelism, and replayable in an external engine (the DuckDB
  * oracle unrolls the same iterations).
  *
  * Init is the first `k` rows by id — deterministic and
  * oracle-replayable (k-means++ trades replayability for seeding
  * quality; curation pipelines need the audit trail more).
  */
object KMeans {

  /** Squared L2 between a vector column and a literal centroid, as a
    * left-associated fold (cross-engine-stable summation order). */
  private def sqDist(v: org.apache.spark.sql.Column, c: Seq[Double]) =
    aggregate(zip_with(v, typedLit(c), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)

  /** Run `iters` Lloyd iterations; returns (assignments, centroids):
    * assignments (idCol, cid, dist — squared L2 to the final centroid,
    * rounded to 6), centroids as an in-memory model
    * Map[cid -> component seq].
    */
  def fit(df: DataFrame, k: Int, dim: Int, iters: Int,
          idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, Map[Int, Seq[Double]]) = {
    require(k >= 1 && iters >= 1 && dim >= 1,
      s"k, dim, iters must all be >= 1; got k=$k dim=$dim iters=$iters")
    val vq = transform(col(vecCol).cast("array<double>"), x => round(x, 9))
    val pts = df.select(col(idCol).cast("long").as("id"), vq.as("v"))
      .localCheckpoint(false) // consumed once per iteration + final assign

    // deterministic init: first k points by id
    var centroids: Seq[(Int, Seq[Double])] = pts.orderBy("id").limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq
    require(centroids.length == k,
      s"KMeans: corpus has ${centroids.length} rows, need k=$k")
    // a dim that disagrees with the data would otherwise null out
    // distances silently through zip_with's null padding — and a wrong
    // length ANYWHERE in the corpus (not just the k init rows) would
    // funnel that row to the lowest cid via NULL-first struct ordering.
    // Cheap aggs over the checkpointed input make it loud instead.
    // NULL vectors and null ELEMENTS need their own check: min/max
    // SKIP nulls, so they'd sail through the size bounds and still
    // funnel to cid 0 (and an all-null corpus would NPE on getInt
    // instead of raising the intended message).
    val nBad = pts.filter(col("v").isNull ||
      exists(col("v"), x => x.isNull)).count()
    require(nBad == 0L,
      s"KMeans: $nBad vectors are null or contain null elements")
    val szs = pts.agg(min(size(col("v"))).as("mn"),
      max(size(col("v"))).as("mx")).head()
    require(szs.getInt(0) == dim && szs.getInt(1) == dim,
      s"KMeans: corpus vector lengths span [${szs.getInt(0)}, " +
        s"${szs.getInt(1)}], dim=$dim given")

    def assign(cs: Seq[(Int, Seq[Double])]): org.apache.spark.sql.Column = {
      // argmin over k literal centroids via array_min on (d, cid)
      // structs: lexicographic struct ordering picks the lowest
      // distance, ties to the LOWEST cid. Each distance is evaluated
      // exactly once — a when-chain fold would inline the accumulator
      // twice per step and, without common-subexpression elimination,
      // re-evaluate earlier distances exponentially often.
      val scored = cs.map { case (cid, cv) =>
        struct(sqDist(col("v"), cv).as("d"), lit(cid).as("cid"))
      }
      array_min(array(scored: _*))
    }

    var it = 0
    while (it < iters) {
      val assigned = pts.select(col("id"), col("v"),
        assign(centroids).getField("cid").as("cid"))
      val sums = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(sum(col("x").cast("decimal(28,9)")).as("sx"),
          count(lit(1)).as("n"))
        .collect()
      val next = sums.groupBy(_.getInt(0)).map { case (cid, rows) =>
        val comp = new Array[Double](dim)
        rows.foreach { r =>
          comp(r.getInt(1)) =
            r.getDecimal(2).doubleValue() / r.getLong(3).toDouble
        }
        (cid, comp.toSeq)
      }
      // a centroid that lost every point keeps its previous position
      // (deterministic; matches the oracle's LEFT JOIN + COALESCE)
      centroids = centroids.map { case (cid, prev) =>
        (cid, next.getOrElse(cid, prev))
      }
      it += 1
    }

    val out = assignTo(
      pts.select(col("id").as(idCol), col("v").as(vecColQuantized)),
      centroids.toMap, idCol, vecColQuantized, preQuantized = true)
    (out, centroids.toMap)
  }

  private val vecColQuantized = "__vq"

  /** Score rows against a fitted centroid model: map-side argmin over
    * the plan-literal centroids — stateless, zero shuffle, usable on a
    * batch OR streaming DataFrame (the streaming twin
    * `DedupStream.clusterScreen` delegates here). Returns
    * (idCol, cid, dist) with dist = squared L2 rounded to 6.
    */
  def assignTo(df: DataFrame, model: Map[Int, Seq[Double]],
               idCol: String = "vec_id", vecCol: String = "embedding",
               preQuantized: Boolean = false): DataFrame = {
    require(model.nonEmpty, "assignTo: empty centroid model")
    require(model.values.map(_.length).toSet.size == 1,
      "assignTo: centroid model has mixed dimensionality " +
        s"{${model.values.map(_.length).toSet.toSeq.sorted.mkString(",")}}")
    val v =
      if (preQuantized) col(vecCol)
      else transform(col(vecCol).cast("array<double>"), x => round(x, 9))
    val scored = model.toSeq.sortBy(_._1).map { case (cid, cv) =>
      struct(sqDist(v, cv).as("d"), lit(cid).as("cid"))
    }
    val best = array_min(array(scored: _*))
    df.select(col(idCol), best.getField("cid").as("cid"),
      round(best.getField("d"), 6).as("dist"))
  }
}

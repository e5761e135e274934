package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** nProbe nearest centroid ids for a vector, as a map-side HOF over
    * the centroid literals: argmin of squared L2 distance, tie-broken
    * by centroid id. Per-row |v|² is constant under the argmin, so the
    * ranking key is |c|² − 2·v·c — one codegen'd dot per centroid,
    * zero shuffle, zero per-row allocation beyond the probe array.
    */
  private def ivfProbes(v: Column, centroids: Seq[(Int, Seq[Double])],
                        nProbe: Int): Column = {
    val scored = array(centroids.map { case (cid, cv) =>
      val cn2 = cv.foldLeft(0.0)((s, x) => s + x * x)
      struct((lit(cn2) - lit(2.0) * dot(v, typedLit(cv))).as("d2"),
        lit(cid).as("cid"))
    }: _*)
    transform(slice(sort_array(scored), 1, nProbe), c => c.getField("cid"))
  }

  /** IVF search core over a fixed coarse quantizer: every corpus row
    * joins its single nearest list; each query probes its `nProbe`
    * nearest lists. Candidates come from an equi-join on the list id —
    * the candidate set shrinks |corpus|/nLists-fold, like the sign-LSH
    * path but with data-adaptive buckets. A corpus row holds exactly
    * one list, so multi-probe never duplicates a (query, neighbor)
    * pair.
    */
  private def ivfSearch(queries: DataFrame, corpus: DataFrame, k: Int,
                        nProbe: Int, cents: Seq[(Int, Seq[Double])],
                        idCol: String, vecCol: String): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("nn"),
      element_at(ivfProbes(col(vecCol), cents, 1), 1).as("list"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("qn"),
      explode(ivfProbes(col(vecCol), cents, nProbe)).as("list"))
    val pairs = c.join(broadcast(q), Seq("list"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("list"), col("n_id"),
        cosPre(col("qv"), col("nv"), col("qn"), col("nn")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "list", "rank", "n_id", "cos")
  }

  /** IVF ANN over an explicit centroid table (`cid` int, `cv`
    * array<double>). The table is the coarse quantizer — nLists rows,
    * tiny by construction — so it is collected once and inlined as plan
    * literals (the faiss-style layout: every worker holds the full
    * coarse quantizer; assignment is local). Deterministic centroids
    * (e.g. a fixed id-range of the corpus) make this path fully
    * oracle-replicable in portable SQL.
    */
  def ivfTopKWithCentroids(queries: DataFrame, corpus: DataFrame, k: Int,
                           nProbe: Int, centroids: DataFrame,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    val cents = centroids
      .select(col("cid").cast("int"), col("cv").cast("array<double>"))
      .collect().toSeq.map(r => (r.getInt(0), r.getSeq[Double](1)))
    ivfSearch(queries, corpus, k, nProbe, cents, idCol, vecCol)
  }

  /** IVF ANN with a KMeans-trained coarse quantizer (seeded — the
    * centroid set is reproducible). Training touches only the corpus
    * vectors; search delegates to the same list-equi-join core as the
    * explicit-centroid path.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nLists: Int,
              seed: Long = 42L, nProbe: Int = 1,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val model = new KMeans().setK(nLists).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("list")
      .fit(corpus.select(array_to_vector(col(vecCol)).as("fv")))
    val cents = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.toSeq) }.toSeq
    ivfSearch(queries, corpus, k, nProbe, cents, idCol, vecCol)
  }

  // ======================================================================
  // Persisted IVF index — the ANN index as a TABLE (the embedding
  // sibling of Dedup's band index). At 100 TB the inverted lists are
  // the asset: the coarse quantizer is trained once, every vector's
  // list assignment and norm are computed once at index time, and the
  // daily job APPENDS new vectors' assignments (same centroids — the
  // faiss add-to-trained-index workflow) instead of re-embedding or
  // re-assigning the corpus. Search reads the table: probes prune to
  // nProbe lists (partition-prunable parquet clustered by list id),
  // and norms come precomputed — one less pass over the vectors.
  // ======================================================================

  /** A persisted (or in-memory) IVF index:
    *   - `centroids` (cid int, cv array<double>) — the coarse
    *     quantizer, model-sized;
    *   - `lists` (list int, n_id, nv array<double>, nn double) — the
    *     inverted lists with precomputed norms.
    */
  final case class IvfIndex(centroids: DataFrame, lists: DataFrame)

  /** Index a corpus against an explicit quantizer: assign every vector
    * its nearest centroid (map-side argmin over plan literals) and
    * precompute its norm.
    */
  def buildIvfIndex(corpus: DataFrame, centroids: DataFrame,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): IvfIndex = {
    val cents = centroids
      .select(col("cid").cast("int"), col("cv").cast("array<double>"))
      .collect().toSeq.map(r => (r.getInt(0), r.getSeq[Double](1)))
    val lists = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("nn"),
      element_at(ivfProbes(col(vecCol), cents, 1), 1).as("list"))
    IvfIndex(centroids.select(col("cid").cast("int"),
      col("cv").cast("array<double>")), lists)
  }

  /** Daily append: assign ONLY the new vectors against the index's own
    * centroids and union the lists — the quantizer never retrains, so
    * append(build(A), B) == build(A ∪ B) row-for-row (SimilaritySpec
    * proves it) and historical vectors are never touched.
    */
  def appendIvfIndex(idx: IvfIndex, fresh: DataFrame,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): IvfIndex =
    IvfIndex(idx.centroids,
      idx.lists.unionByName(
        buildIvfIndex(fresh, idx.centroids, idCol, vecCol).lists))

  /** Right-to-be-forgotten over the ANN index (the [[graft.operators.
    * Dedup.eraseFromBandIndex]] analog): erased vectors leave the
    * inverted lists; the quantizer keeps its geometry (centroids are
    * aggregates, not per-document data — the same reasoning that lets
    * a trained model survive an erasure request while its source rows
    * do not). erase(build(A ∪ B), B) == build(A) row-for-row.
    */
  def eraseFromIvfIndex(idx: IvfIndex, ids: DataFrame): IvfIndex =
    IvfIndex(idx.centroids,
      idx.lists.join(ids.select(col("id").as("n_id")),
        Seq("n_id"), "left_anti"))

  /** Persist as two parquet tables; lists are CLUSTERED by list id so
    * an nProbe search scans co-located runs (and, partitioned by
    * `list`, prunes to the probed lists at planning time).
    */
  def writeIvfIndex(idx: IvfIndex, path: String, partitions: Int = 32): Unit = {
    idx.centroids.write.mode("overwrite").parquet(s"$path/centroids")
    idx.lists.repartition(partitions, col("list"))
      .write.mode("overwrite").parquet(s"$path/lists")
  }

  def readIvfIndex(spark: SparkSession, path: String): IvfIndex =
    IvfIndex(
      centroids = spark.read.parquet(s"$path/centroids"),
      lists = spark.read.parquet(s"$path/lists"))

  /** Compact a persisted IVF index in place: after many daily appends
    * the lists table is thousands of small files; rewrite it clustered
    * by list id into `partitions` files (the read-path pruning shape),
    * then swap directories with the [[graft.operators.Dedup.swapDirs]]
    * retire-aside dance — same exclusive-access requirement and
    * crash-recovery story.
    */
  def compactIvfIndex(spark: SparkSession, path: String,
                      partitions: Int): Unit = {
    val idx = readIvfIndex(spark, path)
    val tmp = s"$path.compact"
    writeIvfIndex(idx, tmp, partitions)
    graft.operators.Dedup.swapDirs(spark, path, tmp)
  }

  /** IVF search against the persisted index: probe assignment for the
    * QUERIES only (the corpus side comes straight from the table, norms
    * included), candidates from the list equi-join, exact cosine
    * rerank. Emits (q_id, list, rank, n_id, cos) — identical to
    * [[ivfTopKWithCentroids]] over the same corpus and quantizer.
    */
  def searchIvfIndex(queries: DataFrame, idx: IvfIndex, k: Int,
                     nProbe: Int, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val cents = idx.centroids
      .select(col("cid").cast("int"), col("cv").cast("array<double>"))
      .collect().toSeq.map(r => (r.getInt(0), r.getSeq[Double](1)))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("qn"),
      explode(ivfProbes(col(vecCol), cents, nProbe)).as("list"))
    val pairs = idx.lists.join(broadcast(q), Seq("list"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("list"), col("n_id"),
        cosPre(col("qv"), col("nv"), col("qn"), col("nn")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "list", "rank", "n_id", "cos")
  }

  /** Product-quantization ANN (ADC + exact rerank) over explicit
    * codebooks — the memory-side companion to IVF's candidate cut: the
    * RANKING pass touches only m small codes per corpus row (m bytes,
    * not the vector), so at 100 TB the approximate scan streams codes
    * while full vectors are fetched only for the `rerank` candidates
    * per query.
    *
    * Codebooks (`sub` int, `code` int, `cw` array<double> of dim/m) are
    * tiny by construction — collected once and inlined as plan
    * literals (like the IVF quantizer): corpus encoding is a map-side
    * argmin per subspace, the per-query distance table is m×k dots
    * computed map-side, and the ADC distance is an explicit
    * left-associated sum of m table lookups (cross-engine
    * reproducible). Asymmetric distance drops the |q_s|² constant —
    * rank-invariant. Deterministic codebooks make the whole path
    * oracle-replicable in portable SQL.
    */
  def pqTopKWithCodebooks(queries: DataFrame, corpus: DataFrame, k: Int,
                          rerank: Int, codebooks: DataFrame, m: Int,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    val books: Map[Int, Seq[(Int, Seq[Double])]] = codebooks
      .select(col("sub").cast("int"), col("code").cast("int"),
        col("cw").cast("array<double>"))
      .collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(t => (t._2, t._3))).toMap
    val subLen = books(0).head._2.length
    // subvectors are sliced ONCE per row (a prior projection), not once
    // per codeword — the k codeword distances then reference the same
    // array column (64 fewer array copies per row at m=4, k=16)
    def subCols(df: DataFrame, id: Column, idAs: String) = df.select(
      id.as(idAs) +:
        (0 until m).map(s =>
          slice(col(vecCol), s * subLen + 1, subLen).as(s"__v_$s")): _*)
    // distances to all k codewords as ONE zip_with over nested-array
    // literals (k unrolled dot expressions would work too, but the
    // generated code is k× larger and janino compile time dominates
    // the whole query). d2 = |cw|² − 2·v_s·cw, |q_s|² dropped
    // (rank-invariant); |cw|² precomputed left-assoc for oracle parity.
    def scoredArr(s: Int): Column = zip_with(
      typedLit(books(s).map(_._2.foldLeft(0.0)((acc, x) => acc + x * x))),
      transform(typedLit(books(s).map(_._2)),
        cw => dot(col(s"__v_$s"), cw)),
      (cn2, d) => cn2 - lit(2.0) * d)
    // argmin via array_position of the min — FIRST position on ties,
    // i.e. the lowest code id (books are sorted by code id), matching
    // the oracle's tiebreak. The stored value is the 1-based POSITION
    // in the (code-sorted) book, not the raw code id, so the ADC table
    // lookup is valid for sparse or non-zero-based code ids too.
    def codeOf(s: Int): Column =
      array_position(scoredArr(s), array_min(scoredArr(s))).cast("int")
    def qTable(s: Int): Column = scoredArr(s)

    // materialize codes and query tables BEFORE the pair join:
    // without the barrier, projection collapse would inline the k-way
    // argmin / distance-table expressions into the per-PAIR projection
    // and recompute them |Q| times per corpus row (measured 30× slower).
    // At scale the corpus code table is persisted offline anyway —
    // codes are the stored representation in any real PQ index.
    val c = subCols(corpus, col(idCol), "n_id")
      .select(col("n_id") +: (0 until m).map(s => codeOf(s).as(s"c_$s")): _*)
      .localCheckpoint(false)
    val q = subCols(queries, col(idCol), "q_id")
      .select(col("q_id") +: (0 until m).map(s => qTable(s).as(s"t_$s")): _*)
      .localCheckpoint(false)
    val adist = (0 until m).map(s =>
      element_at(col(s"t_$s"), col(s"c_$s"))).reduceLeft(_ + _)
    val wA = Window.partitionBy("q_id").orderBy(col("adist").asc, col("n_id").asc)
    val cands = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), adist.as("adist"))
      .withColumn("crank", row_number().over(wA))
      .filter(col("crank") <= rerank)
      .select("q_id", "n_id")
    val cv = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("nn"))
    val qv = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("qn"))
    val wK = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    cands.join(cv, "n_id").join(broadcast(qv), "q_id")
      .select(col("q_id"), col("n_id"),
        cosPre(col("qv"), col("nv"), col("qn"), col("nn")).as("cos"))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cos")
  }

  /** Residual of each vector against its assigned IVF list centroid:
    * (id, list, rv). The subtraction is elementwise double arithmetic
    * (IEEE-exact cross-engine), so callers — and the oracle — can
    * derive residual-space PQ codebooks deterministically.
    */
  def ivfResiduals(df: DataFrame, centroids: DataFrame,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val cents = centroids
      .select(col("cid").cast("int"), col("cv").cast("array<double>"))
      .collect().toSeq.map(r => (r.getInt(0), r.getSeq[Double](1)))
    val centMap = cents.toMap
    df.select(col(idCol).as("id"), col(vecCol).as("v"),
        element_at(ivfProbes(col(vecCol), cents, 1), 1).as("list"))
      .select(col("id"), col("list"),
        zip_with(col("v"), element_at(typedLit(centMap), col("list")),
          (a, b) => a - b).as("rv"))
  }

  /** IVF-PQ composite ANN — the production vector-store default
    * (faiss IndexIVFPQ): the IVF coarse quantizer cuts candidates to
    * the probed lists, and within them ranking reads only m-byte PQ
    * codes of the RESIDUAL (vector − list centroid), so the
    * approximate scan touches codes, never vectors. Exact cosine
    * reranks the top `rerank` survivors.
    *
    * Cross-list comparability: ADC against residual codebooks drops
    * |q_res|² per (query, list) — constant within a list but NOT
    * across the nProbe probed lists — so it is added back explicitly
    * (one number per probe, = |q − c_list|²). The ADC sum is the
    * explicit left-associated m-term chain + that constant, making
    * the candidate cut reproducible cross-engine. Quantizer and
    * codebooks are tiny plan literals (the faiss layout: every worker
    * holds them; assignment and table build are map-side); candidates
    * come from the (list) equi-join, and a corpus row lives in exactly
    * one list so multi-probe never duplicates a pair.
    */
  def ivfpqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                rerank: Int, nProbe: Int, centroids: DataFrame,
                codebooks: DataFrame, m: Int,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val cents = centroids
      .select(col("cid").cast("int"), col("cv").cast("array<double>"))
      .collect().toSeq.map(r => (r.getInt(0), r.getSeq[Double](1)))
    val centMap = cents.toMap
    val books: Map[Int, Seq[(Int, Seq[Double])]] = codebooks
      .select(col("sub").cast("int"), col("code").cast("int"),
        col("cw").cast("array<double>"))
      .collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(t => (t._2, t._3))).toMap
    // Loud contract checks: a dim not divisible into m equal subspaces
    // would silently drop trailing components from code assignment, and
    // a missing subspace would surface as a bare NoSuchElementException.
    require(books.keySet == (0 until m).toSet,
      s"PQ codebooks must cover exactly subspaces 0..${m - 1}; " +
        s"got {${books.keySet.toSeq.sorted.mkString(",")}}")
    val subLen = books(0).head._2.length
    val dim = cents.head._2.length
    require(dim == m * subLen,
      s"vector dim $dim (from IVF centroids) must equal m*subLen = " +
        s"$m*$subLen = ${m * subLen}; trailing components would be " +
        "silently excluded from PQ code assignment")
    def resid(v: Column, list: Column): Column =
      zip_with(v, element_at(typedLit(centMap), list), (a, b) => a - b)
    // per-subspace distances to every codeword (see pqTopKWithCodebooks
    // for why this is one zip_with, not k unrolled dots)
    def scoredArr(s: Int): Column = zip_with(
      typedLit(books(s).map(_._2.foldLeft(0.0)((acc, x) => acc + x * x))),
      transform(typedLit(books(s).map(_._2)),
        cw => dot(col(s"__v_$s"), cw)),
      (cn2, d) => cn2 - lit(2.0) * d)
    def codeOf(s: Int): Column =
      array_position(scoredArr(s), array_min(scoredArr(s))).cast("int")
    def subSlices(rv: Column): Seq[Column] =
      (0 until m).map(s => slice(rv, s * subLen + 1, subLen).as(s"__v_$s"))

    // corpus: one list + m residual codes per row — the stored index
    // representation (persisted offline in a real deployment; the
    // checkpoint is this query's stand-in, same as the PQ path)
    val c = corpus
      .select(col(idCol).as("n_id"), col(vecCol).as("v"),
        element_at(ivfProbes(col(vecCol), cents, 1), 1).as("list"))
      .select(col("n_id") +: col("list") +: subSlices(resid(col("v"), col("list"))): _*)
      .select(col("n_id") +: col("list") +:
        (0 until m).map(s => codeOf(s).as(s"c_$s")): _*)
      .localCheckpoint(false)
    // queries: nProbe (list, residual table, |q_res|²) triples
    val q = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("v"),
        explode(ivfProbes(col(vecCol), cents, nProbe)).as("list"))
      .select(Seq(col("q_id"), col("list"),
        resid(col("v"), col("list")).as("__qr")): _*)
      .select(col("q_id") +: col("list") +:
        dot(col("__qr"), col("__qr")).as("qrn2") +: subSlices(col("__qr")): _*)
      .select(col("q_id") +: col("list") +: col("qrn2") +:
        (0 until m).map(s => scoredArr(s).as(s"t_$s")): _*)
      .localCheckpoint(false)
    val adist = (0 until m).map(s =>
      element_at(col(s"t_$s"), col(s"c_$s"))).reduceLeft(_ + _) + col("qrn2")
    val wA = Window.partitionBy("q_id")
      .orderBy(col("adist").asc, col("n_id").asc)
    val cands = c.join(broadcast(q), Seq("list"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), adist.as("adist"))
      .withColumn("crank", row_number().over(wA))
      .filter(col("crank") <= rerank)
      .select("q_id", "n_id")
    val cv = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("nn"))
    val qv = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("qn"))
    val wK = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    cands.join(cv, "n_id").join(broadcast(qv), "q_id")
      .select(col("q_id"), col("n_id"),
        cosPre(col("qv"), col("nv"), col("qn"), col("nn")).as("cos"))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cos")
  }

  /** IVF-PQ with a trained pipeline: seeded KMeans coarse quantizer
    * (as `ivfTopK`), residual codebooks from per-subspace seeded
    * KMeans over the corpus residuals — the full faiss training recipe
    * distributed as two ML fits. Search delegates to the same
    * plan-literal core as the explicit-parameter path (spec-gated;
    * training is not SQL-expressible).
    */
  def ivfpqTopKTrained(queries: DataFrame, corpus: DataFrame, k: Int,
                       rerank: Int, nProbe: Int, nLists: Int,
                       m: Int, codesPerSub: Int, seed: Long = 42L,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    val coarse = new KMeans().setK(nLists).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("list")
      .fit(corpus.select(array_to_vector(col(vecCol)).as("fv")))
    val cents = coarse.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.toSeq) }.toSeq
    import spark.implicits._
    val centDf = cents.toDF("cid", "cv")
    val res = ivfResiduals(corpus, centDf, idCol, vecCol)
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val subLen = dim / m
    val books = (0 until m).flatMap { s =>
      val sub = new KMeans().setK(codesPerSub).setSeed(seed + s)
        .setFeaturesCol("fv").setPredictionCol("c")
        .fit(res.select(array_to_vector(
          slice(col("rv"), s * subLen + 1, subLen)).as("fv")))
      sub.clusterCenters.zipWithIndex.map { case (v, i) =>
        (s, i, v.toArray.toSeq)
      }
    }
    ivfpqTopK(queries, corpus, k, rerank, nProbe, centDf,
      books.toDF("sub", "code", "cw"), m, idCol, vecCol)
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

  /** Mutual k-NN graph under sign-LSH blocking: every vector ranks its
    * in-bucket neighbors (cos desc, id asc), and an undirected edge
    * survives iff BOTH endpoints rank each other within k — the
    * reciprocity filter that strips hub vectors (a generic centroid-ish
    * embedding lands in everyone's top-k but reciprocates almost
    * nobody), which is why mutual-kNN is the standard edge set for
    * density clustering and near-dup community mining over embedding
    * corpora.
    *
    * Scale shape: candidate generation is the bucket equi-join (pair
    * count bounded by Σ bucket², tuned by `bits` — never all-pairs);
    * the rank window runs AFTER projecting to (src, dst, cos) triples,
    * partitioned by src and bounded by bucket size; the reciprocity
    * check is one equi-join of the k·|V|-row top-k list with itself.
    * Emits (a_id, b_id, cos rounded 4, rank_ab, rank_ba), a_id < b_id.
    */
  def knnGraphMutual(df: DataFrame, k: Int, bits: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(dot(col(vecCol), col(vecCol))).as("nrm"),
      signBucket(col(vecCol), bits).as("bucket"))
    val pairs = v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("src"), col("b.id").as("dst"),
        cosPre(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")).as("cos"))
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst").asc)
    val topk = pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .localCheckpoint(false) // both sides of the reciprocity join
    topk.as("x").join(topk.as("y"),
        col("x.src") === col("y.dst") && col("x.dst") === col("y.src") &&
          col("x.src") < col("x.dst"))
      .select(col("x.src").as("a_id"), col("x.dst").as("b_id"),
        round(col("x.cos"), 4).as("cos"),
        col("x.rank").as("rank_ab"), col("y.rank").as("rank_ba"))
  }

  /** One NN-descent refinement round (Dong et al., WWW'11) over a
    * directed k-NN graph seeded by TWO independent sign-LSH
    * projections: the candidate set for every vector is its current
    * neighbors, its REVERSE neighbors, and its neighbors' neighbors —
    * the "a neighbor of my neighbor is probably my neighbor"
    * expansion. The two-projection seed is load-bearing: a SINGLE
    * disjoint blocking is transitively closed (u~v and v~w force w
    * into u's bucket), so NoN could never leave the bucket and the
    * round would be a no-op by construction. With two relations the
    * u→v (projection 1), v→w (projection 2) path reaches vectors
    * sharing NO bucket with u — exactly the edges blocking misses.
    * Candidates are reranked by exact cosine and cut back to k.
    *
    * Scale shape — the reason NN-descent is THE graph-ANN
    * construction at corpus scale: per round the candidate list is
    * ≤ 2k + 2k + 4k² ids per vector (O(n·k²) total, never all-pairs),
    * built from equi-joins of the 2k·|V|-row edge list with itself;
    * vectors are fetched only for surviving DISTINCT candidate pairs
    * (two hash joins), and the rank window sees O(k²) rows per src.
    * Emits (src, rank, dst, cos, is_new) — is_new marks final edges
    * absent from BOTH seed blockings, the per-round convergence
    * signal (iterate until new-edge count ~ 0; one round is the
    * oracle-gated unit here, the loop is the caller's).
    */
  def nnDescentRound(df: DataFrame, k: Int, bits: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(dot(col(vecCol), col(vecCol))).as("nrm"),
      signBucket(col(vecCol), bits).as("b1"),
      signBucket(slice(col(vecCol), bits + 1, bits), bits).as("b2"))
      .localCheckpoint(false) // seed pairs + two candidate-fetch joins
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst").asc)
    def topkOn(bucket: String): DataFrame =
      v.as("a").join(v.as("b"),
          col(s"a.$bucket") === col(s"b.$bucket") &&
            col("a.id") =!= col("b.id"))
        .select(col("a.id").as("src"), col("b.id").as("dst"),
          cosPre(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm"))
            .as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k).select("src", "dst")
    val seed = topkOn("b1").union(topkOn("b2")).distinct()
      .localCheckpoint(false) // forward, reverse, NoN, and is_new probe
    val cands = seed // forward edges stay candidates
      .union(seed.select(col("dst").as("src"), col("src").as("dst")))
      .union(seed.as("e1").join(seed.as("e2"),
          col("e1.dst") === col("e2.src") && col("e2.dst") =!= col("e1.src"))
        .select(col("e1.src").as("src"), col("e2.dst").as("dst")))
      .distinct()
    cands
      .join(v.select(col("id").as("src"), col("v").as("sv"),
        col("nrm").as("sn")), "src")
      .join(v.select(col("id").as("dst"), col("v").as("dv"),
        col("nrm").as("dn")), "dst")
      .select(col("src"), col("dst"),
        cosPre(col("sv"), col("dv"), col("sn"), col("dn")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .join(seed.withColumn("seeded", lit(true)), Seq("src", "dst"), "left")
      .select(col("src"), col("rank"), col("dst"),
        round(col("cos"), 4).as("cos"),
        coalesce(col("seeded"), lit(false)).unary_!.as("is_new"))
  }

  /** Directional embedding decontamination: flag TRAIN vectors whose
    * cosine with ANY eval vector reaches `threshold` — the semantic
    * twin of n-gram benchmark decontamination ([[Dedup.contaminated]])
    * for paraphrased/embedded leakage that exact shingles miss.
    *
    * The eval set (tiny by definition) broadcasts with its sign-LSH
    * bucket; the train corpus streams past it in ONE map-side pass —
    * bucket equi-probe, then exact cosine only on bucket collisions.
    * No shuffle of the corpus, no self-join: at 100 TB this is scan
    * bandwidth plus a constant-size hash probe per row. Sign-LSH
    * blocking keeps the usual contract: cos ≥ threshold pairs collide
    * in-bucket for high thresholds (a negated vector lands in the
    * complementary bucket and is never even a candidate).
    */
  def crossSetContamination(evalSet: DataFrame, train: DataFrame,
                            threshold: Double, bits: Int,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val e = evalSet.select(col(idCol).as("eval_id"), col(vecCol).as("ev"),
      sqrt(dot(col(vecCol), col(vecCol))).as("en"),
      signBucket(col(vecCol), bits).as("bucket"))
    val tr = train.select(col(idCol).as("train_id"), col(vecCol).as("tv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("tn"),
      signBucket(col(vecCol), bits).as("bucket"))
    tr.join(broadcast(e), "bucket")
      .withColumn("cos", cosPre(col("tv"), col("ev"), col("tn"), col("en")))
      .filter(col("cos") >= threshold)
      .select(col("eval_id"), col("train_id"), col("cos"))
  }

  /** Per-vector int8 scalar quantization (SQ8): code_i =
    * round((v_i − lo) / scale), scale = (hi − lo)/255 — the 4× smaller
    * compressed-domain representation a 100 TB vector store scans
    * instead of raw float32. Constant vectors (hi = lo) encode as 0s.
    * Emits (id, lo, scale, codes array<int>); round-half-up is exact
    * cross-engine for the non-negative operand.
    */
  def sq8Encode(df: DataFrame, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame =
    // two-step select: lo/scale must exist as columns before the
    // per-element lambda can reference them
    df.select(col(idCol).as("id"), col(vecCol).as("v"),
        array_min(col(vecCol)).as("lo"),
        ((array_max(col(vecCol)) - array_min(col(vecCol))) / lit(255.0))
          .as("scale"))
      .select(col("id"), col("lo"), col("scale"),
        transform(col("v"), x =>
          when(col("scale") === 0, lit(0))
            .otherwise(round((x - col("lo")) / col("scale")).cast("int")))
          .as("codes"))

  /** SQ8 ANN top-k: compressed-domain cosine scan over dequantized
    * codes selects k+`rerank` candidates per query; exact vectors are
    * fetched (equi-join on id) only for those candidates and re-scored.
    * The full-precision corpus is never broadcast, never windowed —
    * only (q_id, n_id, score) crosses each rank exchange.
    * Output: (q_id, rank, n_id, cos, cos_sq8).
    */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, k: Int,
              rerank: Int = 4, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("qn"))
    val enc = sq8Encode(corpus, idCol, vecCol)
      .select(col("id").as("n_id"),
        transform(col("codes"), c =>
          col("lo") + c.cast("double") * col("scale")).as("dv"))
      .select(col("n_id"), col("dv"), sqrt(dot(col("dv"), col("dv"))).as("dn"))
    val approx = enc.join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (dot(col("dv"), col("qv")) / (col("dn") * col("qn"))).as("cos_sq8"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_sq8").desc, col("n_id").asc)
    val cand = approx.withColumn("crank", row_number().over(w))
      .filter(col("crank") <= k + rerank).drop("crank")
    val exact = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("nn"))
    val rescored = cand
      .join(exact, "n_id")
      .join(broadcast(q.select(col("q_id"), col("qv"), col("qn"))), "q_id")
      .select(col("q_id"), col("n_id"), col("cos_sq8"),
        cosPre(col("qv"), col("nv"), col("qn"), col("nn")).as("cos"))
    val w2 = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    rescored.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cos", "cos_sq8")
  }

  /** 1-bit binary quantization: bit i of the code is set iff
    * `vec[i] > 0`, packed 32 dimensions per BIGINT word (`w0` = dims
    * 1–32, `w1` = dims 33–64, …). 32-bit packing keeps every shift
    * far from the sign bit, so the identical word values are
    * reproducible in any engine with checked 64-bit shifts; the word
    * array is the layout real binary indexes scan. The packing
    * expression is a fixed OR tree over plan-literal masks —
    * integer-only, codegen'd, map-side.
    */
  def binaryCodes(vec: Column, dim: Int): Seq[Column] = {
    require(dim % 32 == 0, s"dim must be a multiple of 32, got $dim")
    (0 until dim / 32).map { w =>
      (0 until 32).map { i =>
        when(element_at(vec, w * 32 + i + 1) > lit(0.0),
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _).as(s"w$w")
    }
  }

  /** Binary (Hamming) ANN funnel: corpus and queries are collapsed to
    * 1-bit codes (64× smaller than the double vectors — the cheapest
    * compressed-domain scan there is), candidates are the `k + rerank`
    * smallest Hamming distances per query (`bit_count(xor)` per word,
    * summed; ties broken on id), and only the survivors fetch exact
    * vectors for the cosine rerank. Same funnel contract as
    * [[sq8TopK]]: `rank`/`cos` are exact for the reranked set, recall
    * is governed by `rerank`.
    *
    * Scale: the code table is 8·(dim/32) bytes + id per row; the scan
    * is integer XOR/POPCNT inside whole-stage codegen against a
    * broadcast query side — no shuffle until the bounded candidate
    * window, and the exact-vector join touches `|Q|·(k+rerank)` rows
    * only.
    */
  def hammingTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                  dim: Int, rerank: Int = 4, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val nWords = dim / 32
    def codes(df: DataFrame, id: String, pfx: String) =
      df.select(col(idCol).as(id) +:
        binaryCodes(col(vecCol), dim).zipWithIndex
          .map { case (c, w) => c.as(s"$pfx$w") }: _*)
    val q = codes(queries, "q_id", "qw")
    val c = codes(corpus, "n_id", "nw")
    val ham = (0 until nWords)
      .map(w => bit_count(col(s"qw$w").bitwiseXOR(col(s"nw$w"))))
      .reduce(_ + _).cast("int")
    val approx = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), ham.as("hamming"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("hamming").asc, col("n_id").asc)
    val cand = approx.withColumn("crank", row_number().over(w))
      .filter(col("crank") <= k + rerank).drop("crank")
    val exact = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("nn"))
    val qv = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("qn"))
    val rescored = cand.join(exact, "n_id").join(broadcast(qv), "q_id")
      .select(col("q_id"), col("n_id"), col("hamming"),
        cosPre(col("qv"), col("nv"), col("qn"), col("nn")).as("cos"))
    val w2 = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    rescored.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cos", "hamming")
  }

  /** Matryoshka-style truncated-dimension funnel: approximate cosine
    * over only the LEADING `mDims` dimensions (the MRL property —
    * nested prefixes of the embedding are themselves usable
    * embeddings), keep `k + rerank` candidates per query, then exact
    * full-dimension rerank. The coarse scan reads mDims/dim of the
    * bytes the brute-force pass would — the standard first stage when
    * the full vectors don't fit scan bandwidth — while the funnel
    * keeps final scores exact for the survivors.
    *
    * Same funnel contract as [[sq8TopK]]: `rank`/`cos` are exact for
    * the reranked set; recall vs brute force is governed by `rerank`.
    * Requires vectors whose leading `mDims` prefix is non-zero (true
    * for any trained/normalized embedding).
    */
  def matryoshkaTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     mDims: Int, rerank: Int = 4, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("qn"),
      slice(col(vecCol), 1, mDims).as("qm"))
      .withColumn("qmn", sqrt(dot(col("qm"), col("qm"))))
    val trunc = corpus.select(col(idCol).as("n_id"),
        slice(col(vecCol), 1, mDims).as("nm"))
      .withColumn("nmn", sqrt(dot(col("nm"), col("nm"))))
    val approx = trunc
      .join(broadcast(q.select("q_id", "qm", "qmn")), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (dot(col("nm"), col("qm")) / (col("nmn") * col("qmn"))).as("cos_m"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_m").desc, col("n_id").asc)
    val cand = approx.withColumn("crank", row_number().over(w))
      .filter(col("crank") <= k + rerank).drop("crank")
    val exact = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("nn"))
    val rescored = cand
      .join(exact, "n_id")
      .join(broadcast(q.select(col("q_id"), col("qv"), col("qn"))), "q_id")
      .select(col("q_id"), col("n_id"), col("cos_m"),
        cosPre(col("qv"), col("nv"), col("qn"), col("nn")).as("cos"))
    val w2 = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    rescored.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cos", "cos_m")
  }

  /** Deterministic ±1 projection matrix for [[randomProjection]]: k
    * rows × dim, from a seeded LCG (java.util.Random spec — stable
    * across platforms). Exposed so callers (and the SQL oracle) can
    * embed the exact same literals.
    */
  def projectionMatrix(k: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new java.util.Random(seed)
    Seq.fill(k)(Seq.fill(dim)(if (rng.nextBoolean()) 1.0 else -1.0))
  }

  /** Johnson–Lindenstrauss random projection dim → k: coord_j =
    * ⟨v, r_j⟩ / √k with a seeded ±1 matrix inlined as plan literals —
    * one codegen'd dot per output dim, zero shuffle, zero state. The
    * dimensionality-reduction step before ANN indexing when 64–4096-dim
    * embeddings dominate scan cost: distances are preserved to
    * 1 ± O(√(log n / k)) whp, and determinism (seed → matrix) means
    * re-projection of new data stays consistent with the index.
    */
  def randomProjection(df: DataFrame, k: Int, dim: Int, seed: Long,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val m = projectionMatrix(k, dim, seed)
    val scale = lit(math.sqrt(k.toDouble))
    df.select(col(idCol).as("id") +: m.zipWithIndex.map { case (row, j) =>
      (dot(col(vecCol), typedLit(row)) / scale).as(s"c$j")
    }: _*)
  }

  /** SemDeDup-style semantic dedup keepers: bucket the corpus with
    * sign-LSH, compute each bucket's centroid, and keep the member
    * closest to it (cosine, round-6 + id-tiebreak determinism).
    *
    * Centroid determinism WITHOUT per-group buffers: per-dimension
    * sums run as exact DECIMAL over round-6 contributions — partition-
    * order independent like an ordered fold, but O(1) aggregation
    * memory per (bucket, pos) where a collect_list fold would buffer
    * every member (a million-member bucket would hold ~24 MB per
    * dimension row). The 1e-6 contribution quantization is far below
    * the round-6 score output.
    *
    * Scale: one keyed aggregation over exploded (bucket, pos, x) rows;
    * scoring joins each row to its ONE bucket centroid — never
    * member×member pairs, so a bucket with a million near-dups costs
    * O(members), not O(members²).
    */
  def semdedupKeepers(df: DataFrame, bits: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    val e = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBucket(col(vecCol), bits).as("bucket"))
    val cent = e.select(col("bucket"), col("id"),
        posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("bucket", "pos")
      .agg(sum(round(col("x"), 6).cast("decimal(24,6)")).as("sx"),
        count(lit(1)).as("n"))
      .select(col("bucket"), col("pos"),
        (col("sx").cast("double") / col("n")).as("c"))
    val cv = cent.groupBy("bucket")
      .agg(sort_array(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("bucket"), transform(col("pc"), p => p.getField("c")).as("cv"))
    val scored = e.join(cv, "bucket")
      .select(col("bucket"), col("id"),
        round(cosine(col("v"), col("cv")), 6).as("cos_c"))
    val w = Window.partitionBy("bucket")
      .orderBy(col("cos_c").desc, col("id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(Window.partitionBy("bucket")))
      .filter(col("rn") === 1)
      .select(col("bucket"), col("id").as("keep_id"),
        col("n_members"), col("cos_c"))
  }

  /** Maximal Marginal Relevance rerank: pick k results per query that
    * balance relevance against redundancy — the diverse-retrieval step
    * a training-mix curator runs so near-identical top hits don't crowd
    * out coverage. Greedy: each round adds the candidate maximizing
    * λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s).
    *
    * Execution shape: the greedy loop is k driver-side ROUNDS (k is
    * small), but each round is one distributed join over ALL queries'
    * candidate pools at once — never a per-query loop. Pools are capped
    * at `poolSize` rows per query by relevance first, so the quadratic
    * candidate×selected sim term is poolSize·k per query, independent
    * of corpus size.
    *
    * Determinism contract: relevance and pairwise sims are rounded to 6
    * decimals before any argmax, ties break by candidate id — so the
    * selection is a total function of the input (and cross-engine
    * checkable; the oracle unrolls the same greedy rounds in SQL).
    */
  def mmrRerank(queries: DataFrame, corpus: DataFrame, k: Int,
                poolSize: Int, lambda: Double,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && poolSize >= k)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("cv"))
    val rel = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), col("cv"),
        round(cosine(col("qv"), col("cv")), 6).as("rel"))
    val wPool = Window.partitionBy("q_id")
      .orderBy(col("rel").desc, col("c_id").asc)
    val pool = rel.withColumn("rn", row_number().over(wPool))
      .filter(col("rn") <= poolSize).drop("rn")
      .localCheckpoint(false) // consumed k times below
    val wPick = (s: Column) => Window.partitionBy("q_id")
      .orderBy(s.desc, col("c_id").asc)

    var selected = pool
      .withColumn("rn", row_number().over(wPick(col("rel"))))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("c_id"), col("cv"), lit(1).as("sel_round"))
      .localCheckpoint(false)
    var roundNo = 1
    while (roundNo < k) {
      roundNo += 1
      val rem = pool.join(selected.select("q_id", "c_id"),
        Seq("q_id", "c_id"), "left_anti")
      val div = rem.as("r").join(selected.as("s"), Seq("q_id"))
        .select(col("q_id"), col("r.c_id").as("c_id"), col("r.cv").as("cv"),
          col("r.rel").as("rel"),
          round(cosine(col("r.cv"), col("s.cv")), 6).as("sim"))
        .groupBy("q_id", "c_id", "cv", "rel").agg(max(col("sim")).as("mdiv"))
      val score = lit(lambda) * col("rel") - lit(1.0 - lambda) * col("mdiv")
      val pick = div.withColumn("rn", row_number().over(wPick(score)))
        .filter(col("rn") === 1)
        .select(col("q_id"), col("c_id"), col("cv"),
          lit(roundNo).as("sel_round"))
      selected = selected.union(pick).localCheckpoint(false)
    }
    selected.select("q_id", "sel_round", "c_id")
  }

  /** First principal component of an embedding column by the two-pass
    * Gramian + power-iteration shape (what MLlib's PCA does under the
    * hood, re-derived with cross-engine-exact arithmetic):
    *
    *   pass 1  per-dimension mean — exact DECIMAL sums over round-9
    *           quantized inputs (partition-order independent), 64 rows
    *           to the driver;
    *   pass 2  covariance Gram matrix — per row the 64×64 outer product
    *           of the centered vector, round-12 quantized into
    *           DECIMAL(38,12) and summed by (i,j): ONE keyed
    *           aggregation with map-side partial combine, dim² = 4096
    *           groups regardless of corpus size, 4096 rows to the
    *           driver;
    *   driver  `iters` un-normalized power steps from v₀ = (0.125,…)
    *           (exactly representable) with left-associated matvec
    *           folds — O(dim²·iters) scalar work, no cluster round
    *           trips.
    *
    * Everything the cluster then consumes (means, component, norm) is a
    * plan literal, so the projection itself is a zero-shuffle map over
    * the corpus — the same "small model to driver, big data stays put"
    * split as [[ivfTopK]]'s centroids. Determinism: decimal sums are
    * order-independent, the driver fold order is fixed, so the result
    * is bit-identical at any parallelism (audited 32-way vs 7-way).
    *
    * Returns (per-dim means, un-normalized component v_iters, ‖v‖).
    */
  def pcaFirstComponent(df: DataFrame, dim: Int, iters: Int = 30,
                        vecCol: String = "embedding"):
      (Seq[Double], Seq[Double], Double) = {
    val xq = transform(col(vecCol).cast("array<double>"), x => round(x, 9))
    val meanRows = df
      .select(posexplode(xq).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(sum(col("x").cast("decimal(28,9)")).as("sx"),
        count(lit(1)).as("n"))
      .collect()
    require(meanRows.length == dim,
      s"pcaFirstComponent: expected $dim dimensions, saw ${meanRows.length}")
    val n = meanRows.head.getLong(2)
    val means = new Array[Double](dim)
    meanRows.foreach { r =>
      means(r.getInt(0)) = r.getDecimal(1).doubleValue() / n.toDouble
    }
    val meansLit = typedLit(means.toSeq)
    val cExpr = zip_with(xq, meansLit, (x, m) => x - m)
    // Per-partition Gram accumulation: ONE typed aggregation whose
    // buffer is the upper-triangle sum array — each input row folds its
    // outer product straight into the partition-local buffer, and only
    // #partitions buffers (dim·(dim+1)/2 decimals each) reach the
    // merge. The previous shape exploded dim² = 4096 struct rows per
    // input row before a groupBy(i,j); same exact sums, 4096× less row
    // materialization. Arithmetic replicates the prior plan cell for
    // cell — round-12 double (Spark Round semantics) then
    // DECIMAL(38,12) exact addition, commutative and associative, so
    // the result is partition-count-invariant and bit-identical to the
    // explode+groupBy formulation. The triangle is enough: the (i,j)
    // and (j,i) sums are the same decimal by commutativity.
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val seqDoubleEnc: org.apache.spark.sql.Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
    val gramCells = df.select(cExpr.as("c")).as[Seq[Double]]
      .select(new GramAggregator(dim).toColumn)
      .head()
    require(gramCells.length == dim * (dim + 1) / 2,
      s"pcaFirstComponent: Gram triangle incomplete (${gramCells.length} " +
        s"of ${dim * (dim + 1) / 2})")
    val g = Array.ofDim[Double](dim, dim)
    var k = 0
    var gi = 0
    while (gi < dim) {
      var gj = gi
      while (gj < dim) {
        val v = new java.math.BigDecimal(gramCells(k)).doubleValue() / n.toDouble
        g(gi)(gj) = v
        g(gj)(gi) = v
        gj += 1; k += 1
      }
      gi += 1
    }
    var v = Array.fill(dim)(0.125)
    var it = 0
    while (it < iters) {
      val w = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += g(i)(j) * v(j); j += 1 }
        w(i) = acc
        i += 1
      }
      v = w
      it += 1
    }
    val norm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
    (means.toSeq, v.toSeq, norm)
  }

  /** Projection of every vector onto the first principal component —
    * the centered dot with the [[pcaFirstComponent]] literals, divided
    * by ‖v‖ once per row. Zero shuffle: the whole projection runs
    * inside the scan stage.
    */
  def pcaProject(df: DataFrame, dim: Int, iters: Int = 30,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val (means, v, norm) = pcaFirstComponent(df, dim, iters, vecCol)
    val xq = transform(col(vecCol).cast("array<double>"), x => round(x, 9))
    val cExpr = zip_with(xq, typedLit(means), (x, m) => x - m)
    val proj = aggregate(
      zip_with(cExpr, typedLit(v), (c, p) => c * p),
      lit(0.0), (a, x) => a + x) / lit(norm)
    df.select(col(idCol), round(proj, 6).as("pc1"))
  }
}

/** Upper-triangle covariance-Gram accumulator for
  * [[Similarity.pcaFirstComponent]]: buffer = dim·(dim+1)/2 exact
  * decimal sums; each reduce folds one centered vector's outer product
  * into the partition-local buffer.
  *
  * Cell arithmetic replicates the declarative plan it replaced exactly:
  * `round(ci·cj, 12)` on DoubleType is
  * `BigDecimal.valueOf(x).setScale(12, HALF_UP).toDouble` (Spark's
  * RoundBase double path), and the cast to DECIMAL(38,12) re-derives the
  * decimal from the rounded double via `valueOf` — so each summand is
  * the identical decimal, and exact decimal addition makes the total
  * independent of row order and partitioning (the determinism-audit
  * property).
  *
  * Results travel to the driver as plain strings: the default encoder
  * would narrow BigDecimal to DECIMAL(38,18) and a Double would round —
  * both would break exactness.
  */
/** Partition-local Gram buffer: per-cell exact scale-12 sums split into
  * a hot long lane (unscaled ×1e12 integers, `Math.addExact`) and a
  * BigDecimal spill lane a cell overflows into — together they always
  * represent the exact decimal sum.
  */
private[graft] final case class GramBuf(
    longs: Array[Long], spill: Array[java.math.BigDecimal])

private[graft] class GramAggregator(dim: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      Seq[Double], GramBuf, Seq[String]] {
  import java.math.{BigDecimal => JBD, RoundingMode}

  private val cells = dim * (dim + 1) / 2

  override def zero: GramBuf =
    GramBuf(new Array[Long](cells), Array.fill(cells)(JBD.ZERO))

  /** Unscaled (×1e12) HALF_UP rounding of `prod`, replicating
    * `round(prod, 12).cast(decimal(38,12))` exactly. Fast path: for
    * |prod| < 1 the scaled double |prod|·1e12 carries ≤ ~4e-4 of
    * combined error vs the decimal the slow path rounds (shortest-repr
    * drift ≤ 2^-52 relative plus one multiply rounding), so when the
    * fractional part sits > 0.01 from the 0.5 boundary the integer
    * rounding is provably identical — no string round-trip needed. The
    * boundary band and |prod| ≥ 1 fall back to the exact BigDecimal
    * path (valueOf → setScale is the Spark Round double semantic; the
    * second valueOf+setScale of the cast recovers the same 12-dp
    * decimal because 12-dp spacing 1e-12 dwarfs double ulp there).
    */
  private def unscaled12(prod: Double): JBD = {
    val a = math.abs(prod)
    if (a < 1.0) {
      val ay = a * 1e12
      val fl = math.floor(ay)
      val frac = ay - fl
      if (frac > 0.51) {
        val r = (fl + 1).toLong
        return JBD.valueOf(if (prod < 0) -r else r, 12)
      } else if (frac < 0.49) {
        val r = fl.toLong
        return JBD.valueOf(if (prod < 0) -r else r, 12)
      }
    }
    val pd = JBD.valueOf(prod).setScale(12, RoundingMode.HALF_UP).doubleValue()
    JBD.valueOf(pd).setScale(12, RoundingMode.HALF_UP)
  }

  private def addCell(b: GramBuf, k: Int, p: JBD): Unit = {
    val u = p.unscaledValue()
    if (u.bitLength() < 63) {
      val lu = u.longValueExact()
      try b.longs(k) = Math.addExact(b.longs(k), lu)
      catch {
        case _: ArithmeticException =>
          b.spill(k) = b.spill(k).add(JBD.valueOf(b.longs(k), 12))
          b.longs(k) = lu
      }
    } else b.spill(k) = b.spill(k).add(p)
  }

  override def reduce(b: GramBuf, row: Seq[Double]): GramBuf = {
    require(row.length == dim,
      s"GramAggregator: expected $dim-dim vector, got ${row.length}")
    val c = row.toArray
    var k = 0
    var i = 0
    while (i < dim) {
      val ci = c(i)
      var j = i
      while (j < dim) {
        addCell(b, k, unscaled12(ci * c(j)))
        j += 1; k += 1
      }
      i += 1
    }
    b
  }

  override def merge(a: GramBuf, b: GramBuf): GramBuf = {
    var k = 0
    while (k < cells) {
      try a.longs(k) = Math.addExact(a.longs(k), b.longs(k))
      catch {
        case _: ArithmeticException =>
          a.spill(k) = a.spill(k).add(JBD.valueOf(b.longs(k), 12))
      }
      a.spill(k) = a.spill(k).add(b.spill(k))
      k += 1
    }
    a
  }

  override def finish(b: GramBuf): Seq[String] = {
    val out = new Array[String](cells)
    var k = 0
    while (k < cells) {
      out(k) = JBD.valueOf(b.longs(k), 12).add(b.spill(k)).toPlainString
      k += 1
    }
    out.toSeq
  }

  override def bufferEncoder: org.apache.spark.sql.Encoder[GramBuf] =
    org.apache.spark.sql.Encoders.kryo[GramBuf]

  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

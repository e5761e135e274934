package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse tf-idf similarity search over tokenized text — the
  * inverted-index complement to [[Similarity]]'s dense-embedding ANN
  * family (lexical retrieval for RAG corpora, near-dup screening when
  * no embeddings exist, query-document matching).
  *
  * Scale shape — champion lists (impact-ordered index pruning):
  * candidate generation joins only each document's top `championK`
  * terms by weight, so per-doc index entries are bounded and the
  * posting lists that reach the join are the HIGH-IMPACT ones. A term
  * that appears in many documents has high df hence low idf hence low
  * weight — it prunes itself out of the champion set, which is what
  * keeps stop-term posting lists away from the equi-join (the same
  * structural de-skew as Dedup's prefix filter). Exact tf-idf cosine
  * is then computed ONLY for candidate pairs, via a term equi-join on
  * the full vectors, never all-pairs.
  *
  * Determinism: idf is ln(N/df) quantized to 9 decimals at the
  * df-level (one value per distinct df); weights are round-9, products
  * round-12 into DECIMAL(38,12) order-independent sums; ties in both
  * the champion cut and the final top-k break on (term asc) / (id
  * asc). Bit-identical at any parallelism and replayable in DuckDB.
  */
object Sparse {

  /** Per-(doc, term) round-9 tf-idf weights for non-empty tokens:
    * wt = tf · round9(ln(N / df)). */
  def tfidfWeights(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val nDocs = docs.count().toDouble // scalar to driver: corpus size
    // measured r16: Par.spread here is a net LOSS (s_sparse_topk
    // 3.05 → 3.5 s) — topK is window/join-bound downstream, the plain
    // split() explode is cheap next to a shingle+md5 pass
    val tf = docs
      .select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "term")
      .select(col("id"), col("term"),
        (col("tf").cast("double") *
          round(log(lit(nDocs) / col("df").cast("double")), 9)).as("wt"))
      .withColumn("wt", round(col("wt"), 9))
  }

  /** Top-`k` most cosine-similar corpus docs per query doc. Query set
    * = rows where `queryPred` holds; self-matches excluded. Returns
    * (q_id, rank, c_id, sim) with sim rounded to 6.
    *
    * `candK` bounds the EXACT rerank: candidates are ranked per query
    * by shared-champion-term count (ties to the lower id) and only the
    * top `candK` get the full-vector cosine. Short docs over a small
    * vocabulary can make nearly every corpus doc share a champion term
    * with every query — without this cut the rerank join is
    * |queries|·|corpus| rows, the all-pairs shape champion lists exist
    * to avoid. Like the champion cut itself this is part of the
    * retrieval contract (the oracle replays it exactly), not a lossy
    * shortcut bolted on after.
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queryPred: Column, k: Int, championK: Int = 16,
           candK: Int = 200): DataFrame = {
    require(k >= 1 && championK >= 1 && candK >= k,
      s"need k >= 1, championK >= 1, candK >= k; " +
        s"got k=$k championK=$championK candK=$candK")
    // Repartitioned on id BEFORE the checkpoint: AQE coalesces the
    // weights frame's few shuffled MB to ~1 partition at fixture
    // scale, and the checkpoint PINS that width — the r17 probe showed
    // the whole query as ~20 serial one-task stages. The win is
    // WIDTH: the norms agg, the champion window sort, and both rerank
    // join probes now run at session width instead of single-task.
    // (Their exchanges on id remain — a checkpoint's partitioning is
    // invisible to the planner under AQE, measured r17 — but their
    // map sides no longer serialize.)
    val w = tfidfWeights(docs, idCol, textCol)
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions,
        col("id"))
      .localCheckpoint(false)
    val norms = w
      .select(col("id"),
        round(col("wt") * col("wt"), 12).cast("decimal(38,12)").as("w2"))
      .groupBy("id").agg(sqrt(sum(col("w2")).cast("double")).as("nrm"))
    // champion cut: per-doc top terms by (weight desc, term asc)
    val champs = w
      .withColumn("rn", row_number().over(
        Window.partitionBy("id")
          .orderBy(col("wt").desc, col("term").asc)))
      .filter(col("rn") <= championK)
      .select("id", "term")
      .localCheckpoint(false) // both sides of the candidate self-join
    val qids = docs.filter(queryPred).select(col(idCol).as("id"))
    val qchamps = champs.join(qids, "id")
    val cand = qchamps.as("a").join(champs.as("b"),
        col("a.term") === col("b.term") && col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("q_id"), col("b.id").as("c_id"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("shared").desc, col("c_id").asc)))
      .filter(col("crn") <= candK)
      .select("q_id", "c_id")
    // exact rerank on the full sparse vectors (term equi-join bounded
    // to candidate pairs)
    val sp = cand
      .join(w.select(col("id").as("q_id"), col("term"), col("wt").as("wa")),
        Seq("q_id"))
      .join(w.select(col("id").as("c_id"), col("term"), col("wt").as("wb")),
        Seq("c_id", "term"))
      .groupBy("q_id", "c_id")
      .agg(sum(round(col("wa") * col("wb"), 12).cast("decimal(38,12)"))
        .as("sp"))
    sp
      .join(norms.select(col("id").as("q_id"), col("nrm").as("na")), "q_id")
      .join(norms.select(col("id").as("c_id"), col("nrm").as("nb")), "c_id")
      .withColumn("sim",
        round(col("sp").cast("double") / (col("na") * col("nb")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("c_id").asc)))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "sim")
  }
}

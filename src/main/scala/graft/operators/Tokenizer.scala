package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted tokenizer-model artifact — the k-means-artifact treatment
  * ([[KMeans.writeModel]]) for induced subword vocabularies. A
  * tokenizer vocabulary is trained ONCE per corpus (the induction is
  * the corpus-scale job) and then consumed by every encode after it;
  * re-inducing per query run both wastes the big scan and silently
  * re-trains the model a downstream consumer thought was frozen. The
  * artifact holds three model-sized tables:
  *
  *   - `pieces` (piece, w): the vocabulary with its induction weights;
  *   - `meta`   (kind, w_total): the tokenizer family and the weight
  *     normalizer (unigram scores are ln(w/w_total));
  *   - `uses`   (piece, uses): per-piece usage of the TRAINING
  *     word-type table under this vocabulary — the drift baseline.
  *
  * Weights are exact longs, so the artifact round-trips bit-exactly
  * and encode-from-artifact == encode-from-fit (TokenizerSpec's
  * lifecycle law — the [[KMeans.readModel]] law shape). Encoding at
  * 100 TB stays the established type-table pattern: encode each
  * DISTINCT word once against the plan-literal vocabulary, broadcast
  * the type table back to the corpus.
  */
object Tokenizer {

  /** The word-frequency TYPE table — the one corpus-scale job of
    * every tokenizer in this engine.
    */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(graft.functions.Text.tokens(col(textCol)))
        .as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Induce a vocabulary (piece, w) over a word-type table, exactly as
    * the gated queries do: substring candidates weighted by word
    * frequency, deterministic (w desc, piece asc) selection.
    * `wordpiece` keeps the top-`top` length-2..8 substrings;
    * `unigram` keeps every character plus the top-`top` length-2..8
    * (characters make segmentation total).
    */
  def induceVocab(wf: DataFrame, kind: String, top: Int = 200): DataFrame = {
    require(kind == "wordpiece" || kind == "unigram",
      s"unknown tokenizer kind: $kind")
    val minLen = if (kind == "wordpiece") 2 else 1
    val subs = wf.select(col("freq"), explode(array_distinct(flatten(
        transform(sequence(lit(minLen), lit(8)), l =>
          transform(filter(sequence(lit(1), length(col("word"))),
              i => i + l - lit(1) <= length(col("word"))),
            i => col("word").substr(i, l)))))).as("sub"))
      .groupBy("sub").agg(sum("freq").as("w"))
    val picked =
      if (kind == "wordpiece")
        subs.orderBy(col("w").desc, col("sub").asc).limit(top)
      else {
        val s2 = subs.localCheckpoint(false) // chars + the top-k
        s2.filter(length(col("sub")) === 1)
          .unionByName(s2.filter(length(col("sub")) >= 2)
            .orderBy(col("w").desc, col("sub").asc).limit(top))
      }
    picked.select(col("sub").as("piece"), col("w"))
  }

  final case class VocabModel(kind: String, wTotal: Long,
                              pieces: Seq[(String, Long)]) {
    /** The plan-literal vocabulary for the greedy wordpiece encode
      * (order-free: longest-match ties are impossible — same-length
      * matching prefixes are the same string).
      */
    def vocabList: Seq[String] = pieces.map(_._1)
  }

  /** Persist a fitted vocabulary: `pieces` + `meta` + the training
    * `uses` baseline. All three are model-sized — one file each.
    */
  def writeVocab(spark: SparkSession, path: String, kind: String,
                 pieces: DataFrame, uses: DataFrame): Unit = {
    import spark.implicits._
    pieces.orderBy(col("piece"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/pieces")
    // w_total derives from the PERSISTED pieces (read back), not from
    // re-executing the caller's plan — a nondeterministic or
    // non-checkpointed input can't skew meta against the written table
    val wTotal = pieces.sparkSession.read.parquet(s"$path/pieces")
      .agg(coalesce(sum("w"), lit(0L))).collect()(0).getLong(0)
    Seq((kind, wTotal)).toDF("kind", "w_total")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    uses.orderBy(col("piece"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/uses")
  }

  /** Read a persisted vocabulary back (model-sized collect — longs
    * round-trip parquet exactly, so encode-from-artifact ==
    * encode-from-fit, the TokenizerSpec lifecycle law).
    */
  def readVocab(spark: SparkSession, path: String): VocabModel = {
    val meta = spark.read.parquet(s"$path/meta").collect()(0)
    val pieces = spark.read.parquet(s"$path/pieces")
      .orderBy(col("piece")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    VocabModel(meta.getString(0), meta.getLong(1), pieces)
  }

  /** Integer-quantized unigram piece scores from a model:
    * round(ln(w/w_total)·1e6) as LONG — computed through the SAME
    * Spark expression tree the induction queries use, so
    * scores-from-artifact == scores-from-fit bit-for-bit.
    */
  def scoreMapE6(spark: SparkSession, model: VocabModel): Map[String, Long] = {
    import spark.implicits._
    model.pieces.toDF("piece", "w")
      .select(col("piece"),
        round(log(col("w").cast("double") / lit(model.wTotal.toDouble))
          * lit(1e6), 0).cast("long").as("sc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Viterbi segmentation columns under integer piece scores: the
    * array-of-structs DP (ties toward the SHORTER last piece) and the
    * backpointer walk, as one expression pair over a `word` column —
    * the shared machinery of t_unigram_viterbi and the
    * encode-from-artifact path. Returns (score_e6, pieces).
    */
  def viterbi(word: Column, scored: Map[String, Long]): (Column, Column) = {
    val scoreMap = typedLit(scored) // model-sized plan literal
    val L = length(word)
    val dp = aggregate(
      sequence(lit(1), L),
      array(struct(lit(0L).as("s"), lit(0).as("bp"))),
      (acc, j) => {
        val cands = filter(
          transform(sequence(lit(1), lit(8)), l => {
            // null-safe throughout: l > j makes get() return null,
            // an out-of-vocab piece makes try_element_at null —
            // either nulls the score and the filter drops it
            val piece = word.substr(j - l + lit(1), l)
            val sTot = get(acc, j - l).getField("s") +
              try_element_at(scoreMap, piece)
            struct(sTot.as("s"), (lit(0) - l).as("negl"), l.as("bp"))
          }),
          c => c.getField("s").isNotNull)
        val mx = array_max(cands)
        concat(acc, array(struct(mx.getField("s").as("s"),
          mx.getField("bp").as("bp"))))
      })
    (get(dp, L).getField("s"), dp)
  }

  /** Backpointer walk over a materialized DP column (the DP array is
    * reused by score AND walk, so callers materialize it in a column
    * first). Returns the piece array.
    */
  def viterbiPieces(word: Column, dpCol: Column): Column = {
    val L = length(word)
    aggregate(
      sequence(lit(1), L),
      struct(L.as("pos"), array().cast("array<string>").as("ps")),
      (st, _) => {
        val pos = st.getField("pos")
        val bp = get(dpCol, pos).getField("bp")
        when(pos > 0, struct((pos - bp).as("pos"),
          concat(array(word.substr(pos - bp + lit(1), bp)),
            st.getField("ps")).as("ps")))
          .otherwise(st)
      }).getField("ps")
  }

  /** Per-piece usage census of an encoded word-type table: each TYPE
    * encoded once, usage weighted by word frequency — the baseline
    * `writeVocab` persists and the drift check compares against.
    */
  def pieceUses(wf: DataFrame, enc: Column): DataFrame =
    wf.select(col("freq"), explode(enc).as("piece"))
      .groupBy("piece").agg(sum("freq").as("uses"))

  /** Drift report: a fresh batch's piece usage against the artifact's
    * training baseline, full-outer so vanished and newly-hot pieces
    * both keep a row; shares in exact ppm of each side's total.
    */
  def vocabDrift(spark: SparkSession, path: String,
                 batchUses: DataFrame): DataFrame = {
    val train = spark.read.parquet(s"$path/uses")
      .select(col("piece"), col("uses").as("train_uses"))
      .localCheckpoint(false)
    val b = batchUses.select(col("piece"), col("uses").as("batch_uses"))
      .localCheckpoint(false)
    // coalesce: an EMPTY side sums to NULL — the drift report of a
    // zero-use side is all-ppm-on-the-other-side, not an NPE
    val tt = train.agg(coalesce(sum("train_uses"), lit(0L)))
      .collect()(0).getLong(0)
    val bt = b.agg(coalesce(sum("batch_uses"), lit(0L)))
      .collect()(0).getLong(0)
    train.join(b, Seq("piece"), "full_outer")
      .select(col("piece"),
        coalesce(col("train_uses"), lit(0L)).as("train_uses"),
        coalesce(col("batch_uses"), lit(0L)).as("batch_uses"))
      .withColumn("train_ppm",
        expr(s"train_uses * 1000000 div ${math.max(tt, 1L)}"))
      .withColumn("batch_ppm",
        expr(s"batch_uses * 1000000 div ${math.max(bt, 1L)}"))
      .withColumn("delta_ppm", col("batch_ppm") - col("train_ppm"))
  }
}

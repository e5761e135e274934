package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression TRAINING for the hashed linear
  * quality classifier — the missing half of `t_quality_classifier`,
  * which ships a trained weight vector as a plan literal but until now
  * had to be trained elsewhere. Batch gradient descent over hashed
  * bag-of-words features: each epoch is two map-combinable
  * aggregations over the (doc, bucket, count) feature table (one for
  * the per-doc logit, one for the per-bucket gradient), the model
  * state is bucket-sized (256 weights — the k-means-centroid shape),
  * and the driver loop is over EPOCHS, never rows. At 100 TB an epoch
  * is exactly two shuffles on (doc) and (bucket); nothing grows with
  * the corpus but the scans.
  *
  * Oracle discipline (every step replayable in SQL): weights live as
  * exact DECIMAL(12,6); the logit z = Σ k·w is an exact decimal sum;
  * the sigmoid is the one libm call, rounded to 9 dp before use
  * (round-before-use, as with ln everywhere in this engine); the
  * residual is an exact DECIMAL(12,9); the gradient Σ k·err is exact;
  * the update w + lr·g/n runs in IEEE double and rounds back to 6 dp —
  * one identical expression tree on both engines, so training is
  * bit-reproducible under any partitioning.
  */
object Logistic {

  private val Hex = "0123456789abcdef".map(_.toString)

  /** Feature-space ids recorded in the model artifact's meta table —
    * the versioning that makes a weight vector self-describing:
    * scoring under the wrong featurization is silent garbage, so every
    * deploy/warm-start path resolves the space FROM the artifact
    * ([[gramOf]] hard-fails on an id this build doesn't know).
    *
    *   - `md5u2`: hashed unigrams, md5-prefix-2 (256 buckets) — the
    *     original space.
    *   - `md5b2`: hashed word BIGRAMS (2-token shingles of the
    *     non-empty token stream), same 256-bucket md5-prefix-2 hash —
    *     doubles the effective context per feature without changing
    *     the bucket-sized model state or any plan shape.
    */
  val SpaceUnigram = "md5u2"
  val SpaceBigram = "md5b2"

  def spaceOf(gram: Int): String = gram match {
    case 1 => SpaceUnigram
    case 2 => SpaceBigram
    case g => throw new IllegalArgumentException(
      s"unsupported feature gram order: $g (know 1, 2)")
  }

  /** Gram order of a recorded feature-space id; LOUD on an unknown id
    * (an artifact from a newer featurization must never silently
    * mis-score under this build's hash).
    */
  def gramOf(space: String): Int = space match {
    case SpaceUnigram => 1
    case SpaceBigram => 2
    case other => throw new IllegalArgumentException(
      s"unknown classifier feature space: $other " +
        s"(know $SpaceUnigram, $SpaceBigram)")
  }

  /** The full trained-classifier artifact: bucket weights + the
    * feature space they were fit in + the DEPLOYMENT operating point.
    *
    * `threshold` is the PR-curve-selected boundary ([[operatingPoints]]
    * / [[selectOperatingPoint]]): when present, deployment keeps a
    * document iff its exact-decimal logit REACHES it (z >= t — the
    * PR row's own "predict positive at this distinct z" semantics);
    * when absent (never selected, or a pre-meta artifact), the legacy
    * decimal-sign contract z > 0 applies. Both comparisons run in
    * exact DECIMAL.
    */
  final case class Trained(weights: Map[String, BigDecimal],
                           space: String = SpaceUnigram,
                           threshold: Option[BigDecimal] = None) {
    def gram: Int = gramOf(space)

    /** The deployment keep-clause over a text column — the single
      * definition the batch curation chain, the streaming screen, and
      * the `model score` CLI all gate with.
      */
    def keeps(text: org.apache.spark.sql.Column)
        : org.apache.spark.sql.Column =
      keepsZ(zInline(text, weights, 2, gram))

    /** The same decision over an already-computed exact-decimal logit
      * column (callers that surface z alongside the verdict score
      * once and decide on the scored column).
      */
    def keepsZ(z: org.apache.spark.sql.Column)
        : org.apache.spark.sql.Column = threshold match {
      case None => z > lit(0)
      case Some(t) => z >= lit(t.bigDecimal)
    }
  }

  /** The full bucket universe for an md5-prefix feature space: 16^n
    * buckets — 256 at the default prefix length 2 (the DSIR feature
    * space), still model-sized next to any corpus.
    */
  def bucketSpace(prefixLen: Int = 2): Seq[String] =
    (1 until prefixLen).foldLeft(Hex) { (acc, _) =>
      acc.flatMap(p => Hex.map(p + _))
    }

  /** Hashed bag-of-features with a binary label: (idCol, y, b, k) —
    * one corpus-scale job, reused by every epoch (callers
    * localCheckpoint it). `gram` = 1 hashes the non-empty tokens
    * themselves; 2 hashes their 2-shingles (word bigrams) — the
    * bucket space and every downstream plan shape are unchanged, a
    * doc with fewer than `gram` tokens simply contributes no rows.
    */
  def hashedFeatures(docs: DataFrame, label: org.apache.spark.sql.Column,
                     idCol: String = "doc_id",
                     textCol: String = "text",
                     prefixLen: Int = 2,
                     gram: Int = 1): DataFrame = {
    // Par.spread: tokenize+md5-bucket is the CPU-dense pass; an
    // under-split input would run it on one core (identity at real
    // scan widths)
    val spreadDocs = Par.spread(docs)
    val base = if (gram == 1)
      spreadDocs.select(col(idCol), when(label, 1).otherwise(0).as("y"),
          explode(graft.functions.Text.tokens(col(textCol))).as("tok"))
        .filter(col("tok") =!= "")
    else
      spreadDocs.select(col(idCol), when(label, 1).otherwise(0).as("y"),
        explode(graft.functions.Text.shingles(
          filter(graft.functions.Text.tokens(col(textCol)),
            t => t =!= ""), gram)).as("tok"))
    base
      .select(col(idCol), col("y"),
        substring(md5(col("tok")), 1, prefixLen).as("b"))
      .groupBy(idCol, "y", "b").agg(count(lit(1)).as("k"))
    // measured r17: a repartition(id) here (widening the checkpoint the
    // callers pin, so epochs run 32-wide) is a net LOSS — A/B probe:
    // t_quality_train_eval 2.1→2.9 s, warm_start 1.4→1.9 s, and total
    // epoch task CPU 9–15 s → 35–50 s. The per-epoch aggregations over
    // this bucket-collapsed table are too small to amortize 32-way
    // task overhead; at corpus scale the groupBy output is wide on its
    // own. Left at the planner's width deliberately.
  }

  /** One batch-GD epoch: returns the updated 16-bucket weight map.
    * All arithmetic runs through Spark expressions (never driver-side
    * math), so the update tree is the oracle's tree.
    */
  def epoch(spark: SparkSession, feats: DataFrame,
            weights: Map[String, BigDecimal], nDocs: Long,
            lr: Double, idCol: String = "doc_id",
            buckets: Seq[String] = bucketSpace())
      : Map[String, BigDecimal] = {
    import spark.implicits._
    val wMap = typedLit(weights)
    val z = score(feats, weights, idCol)
    val errs = z.select(col(idCol),
      round(col("y").cast("double") -
          round(lit(1.0) / (lit(1.0) + exp(-col("z").cast("double"))), 9),
        9).cast("decimal(12,9)").as("err"))
    val grad = feats.join(errs, idCol)
      .groupBy("b")
      .agg(sum(col("k").cast("decimal(18,0)") * col("err")).as("g"))
      .collect().map(r => r.getString(0) -> BigDecimal(r.getDecimal(1)))
      .toMap // bucket-sized
    val gMap = typedLit(grad)
    buckets.toDF("b")
      .select(col("b"),
        round(try_element_at(wMap, col("b")).cast("decimal(12,6)")
            .cast("double") +
          lit(lr) * coalesce(try_element_at(gMap, col("b")),
            lit(0).cast("decimal(38,9)")).cast("double") /
          lit(nDocs.toDouble), 6).cast("decimal(12,6)").as("w"))
      .collect().map(r => r.getString(0) -> BigDecimal(r.getDecimal(1)))
      .toMap
  }

  /** Train `epochs` rounds from zero weights; returns the weight map
    * AFTER each epoch, in order.
    */
  def train(spark: SparkSession, feats: DataFrame, nDocs: Long,
            epochs: Int, lr: Double, idCol: String = "doc_id",
            buckets: Seq[String] = bucketSpace())
      : Seq[Map[String, BigDecimal]] = {
    val zero = buckets.map(_ -> BigDecimal(0).setScale(6)).toMap
    trainFrom(spark, feats, nDocs, epochs, lr, zero, idCol, buckets)
  }

  /** Train `epochs` MORE rounds from a WARM start — the daily-loop
    * treatment for the model: read the persisted artifact
    * ([[readModel]]), continue gradient descent on a new batch, and
    * persist the updated weights back. Because an epoch is a pure
    * deterministic function of (weights, features), continuing on the
    * SAME features is exactly the longer batch schedule:
    * trainFrom(train(f, a).last, f, b) == train(f, a + b).drop(a)
    * (LogisticSpec law; the oracle replays warm-start results as one
    * unrolled a+b-epoch schedule). Continuing on a DIFFERENT batch is
    * sequential fine-tuning — the documented drift from the
    * batch-union gradient path: each epoch's gradient sees only its
    * own batch's features, so warm-start-on-A-then-B equals the union
    * schedule ONLY when A == B; [[weightDrift]] is the report that
    * makes the divergence observable.
    */
  def trainFrom(spark: SparkSession, feats: DataFrame, nDocs: Long,
                epochs: Int, lr: Double, init: Map[String, BigDecimal],
                idCol: String = "doc_id",
                buckets: Seq[String] = bucketSpace())
      : Seq[Map[String, BigDecimal]] =
    (1 to epochs).scanLeft(init) { (w, _) =>
      epoch(spark, feats, w, nDocs, lr, idCol, buckets)
    }.tail

  /** Drift report between a persisted weight map and a freshly-trained
    * one (the tokenizer `uses`-drift pattern for the classifier): one
    * bucket-sized frame (b, w_start, w_now, delta) with the EXACT
    * decimal difference — the monitoring table a warm-start loop
    * alerts on before promoting the updated artifact.
    */
  def weightDrift(spark: SparkSession, start: Map[String, BigDecimal],
                  now: Map[String, BigDecimal]): DataFrame = {
    import spark.implicits._
    val keys = (start.keySet ++ now.keySet).toSeq.sorted
    keys.map { b =>
      val s = start.getOrElse(b, BigDecimal(0).setScale(6))
      val n = now.getOrElse(b, BigDecimal(0).setScale(6))
      (b, s, n, n - s)
    }.toDF("b", "w_start", "w_now", "delta")
  }

  /** Score a feature table under a weight map: (idCol, y, z) with the
    * exact-decimal logit — deployment is `z > 0` (a sign decided in
    * decimal, never IEEE), the same contract as
    * [[graft.functions.Text.hashedLinearDot]]'s streaming screen.
    */
  def score(feats: DataFrame, weights: Map[String, BigDecimal],
            idCol: String = "doc_id"): DataFrame = {
    // positional array literal, not a map literal: a literal map's
    // lookup scans all 256 entries per feature row (see zInline)
    val arr = typedLit(bucketSpace()
      .map(b => weights.getOrElse(b, BigDecimal(0).setScale(6))))
    feats.groupBy(idCol, "y")
      .agg(sum(col("k").cast("decimal(18,0)") *
        element_at(arr, conv(col("b"), 16, 10).cast("int") + 1)
          .cast("decimal(12,6)")).as("z"),
        sum(col("k")).as("nt"))
  }

  /** Persist a trained weight map as a parquet artifact (the
    * k-means/tokenizer treatment): one bucket-sized `weights` table
    * (b, w DECIMAL(12,6)). Exact decimals round-trip parquet, so
    * score-from-artifact == score-from-fit (LogisticSpec law).
    */
  def writeModel(spark: SparkSession, path: String,
                 weights: Map[String, BigDecimal]): Unit = {
    import spark.implicits._
    weights.toSeq.sortBy(_._1).toDF("b", "w")
      .select(col("b"), col("w").cast("decimal(12,6)").as("w"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/weights")
  }

  def readModel(spark: SparkSession, path: String)
      : Map[String, BigDecimal] =
    spark.read.parquet(s"$path/weights").collect()
      .map(r => r.getString(0) -> BigDecimal(r.getDecimal(1))).toMap

  /** Persist the FULL trained artifact: the weights table plus a
    * one-row `meta` table (space, threshold DECIMAL(12,6) — null
    * until an operating point is selected). Exact decimals round-trip
    * parquet, so deploy-from-artifact == deploy-from-fit including
    * the threshold comparison (LogisticSpec law).
    */
  def writeTrained(spark: SparkSession, path: String, m: Trained): Unit = {
    gramOf(m.space) // refuse to persist an id no reader could resolve
    writeModel(spark, path, m.weights)
    spark.range(1).select(
        lit(m.space).as("space"),
        m.threshold
          .map(t => lit(t.bigDecimal).cast("decimal(12,6)"))
          .getOrElse(lit(null).cast("decimal(12,6)")).as("threshold"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Read the full artifact back. A pre-meta artifact (weights table
    * only — the round-13 on-disk shape) resolves to the unigram space
    * with no stored operating point, so old artifacts keep deploying
    * under the legacy z > 0 sign contract unchanged.
    */
  def readTrained(spark: SparkSession, path: String): Trained = {
    val w = readModel(spark, path)
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(metaPath)) {
      val r = spark.read.parquet(s"$path/meta").collect()(0)
      val m = Trained(w, r.getString(0),
        Option(r.getDecimal(1)).map(BigDecimal(_)))
      gramOf(m.space) // hard-fail on an unknown featurization id
      m
    } else Trained(w)
  }

  /** The operating-point MENU from a labeled scored frame (z exact
    * decimal, y boolean): one row per DISTINCT achieved logit t with
    * the confusion of "predict positive when z >= t" — tp/fp from the
    * totals minus ascending prefix sums over the distinct-z histogram
    * ([[Ranks.prefixSums]] — a value grid, never a corpus-sized global
    * sort), precision/recall/F1 in exact integer ppm (F1's closed form
    * 2tp/(2tp+fp+fn) needs no intermediate rounding).
    */
  def operatingPoints(scored: DataFrame): DataFrame = {
    val hist = scored.groupBy("z").agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("cp"),
      sum(when(!col("y"), 1L).otherwise(0L)).as("cn"))
    val tot = scored.groupBy().agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("np"),
      sum(when(!col("y"), 1L).otherwise(0L)).as("nn"))
    Ranks.prefixSums(hist, "z", Seq("cp", "cn"))
      .crossJoin(broadcast(tot))
      .withColumn("tp", col("np") - col("pre_cp"))
      .withColumn("fp", col("nn") - col("pre_cn"))
      .withColumn("fn", col("np") - col("tp"))
      .withColumn("precision_ppm",
        when(col("tp") + col("fp") > 0,
          expr("tp * 1000000 div (tp + fp)")))
      .withColumn("recall_ppm",
        when(col("np") > 0, expr("tp * 1000000 div np")))
      .withColumn("f1_ppm",
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          expr("2 * tp * 1000000 div (2 * tp + fp + fn)")))
      .select(col("z"), col("tp"), col("fp"), col("fn"),
        col("precision_ppm"), col("recall_ppm"), col("f1_ppm"))
  }

  /** Select ONE deployment threshold from the operating-point menu —
    * the number that moves from the monitoring battery into the
    * artifact's meta table:
    *
    *   - with `minPrecisionPpm`: the highest-recall point whose
    *     precision reaches the target (recall decreases in z, so that
    *     is the SMALLEST qualifying z; ties cannot occur on a
    *     distinct-z grid). Falls back to max-F1 when no point
    *     qualifies — a loud fallback would strand the daily loop on a
    *     bad day; the selection report makes the achieved numbers
    *     visible instead.
    *   - otherwise: the max-F1 point (smallest z among F1 ties — the
    *     recall-favoring deterministic tie-break).
    *
    * Returns the selected menu ROW (threshold + its confusion), all
    * exact integers — the oracle replays the same ORDER BY/LIMIT.
    */
  def selectOperatingPoint(points: DataFrame,
                           minPrecisionPpm: Option[Long] = None)
      : DataFrame = {
    val byF1 = points
      .orderBy(col("f1_ppm").desc_nulls_last, col("z").asc).limit(1)
    val chosen = minPrecisionPpm match {
      case None => byF1
      case Some(p) =>
        val q = points.filter(col("precision_ppm") >= p)
          .orderBy(col("z").asc).limit(1)
        if (q.isEmpty) byF1 else q
    }
    chosen.select(col("z").as("threshold"), col("tp"), col("fp"),
      col("fn"), col("precision_ppm"), col("recall_ppm"), col("f1_ppm"))
  }

  /** Driver-side convenience: score a labeled eval frame under a
    * trained space, select the operating point, and return the
    * threshold as the exact decimal the meta table stores.
    */
  def chooseThreshold(docs: DataFrame, m: Trained,
                      label: org.apache.spark.sql.Column,
                      idCol: String = "doc_id",
                      textCol: String = "text",
                      minPrecisionPpm: Option[Long] = None): BigDecimal = {
    val scored = scoreInline(docs, m.weights, idCol, textCol, 2, m.gram)
      .filter(col("n_tokens") >= m.gram)
      .join(docs.select(col(idCol), label.as("__y")), idCol)
      .select(col("z"), col("__y").as("y"))
    val row = selectOperatingPoint(operatingPoints(scored),
      minPrecisionPpm).collect()(0)
    BigDecimal(row.getDecimal(0))
  }

  /** Per-ROW scoring under a weight map — the deployment shape: one
    * exact-decimal fold over the document's own token array (Σ_tok
    * w[bucket] == Σ_b k_b·w_b, the same exact sum [[score]] reaches
    * through its aggregation), so the trained screen runs at scan
    * speed with NO shuffle, on a batch or a STREAM (stateless —
    * the `t_quality_classifier` twin shape, now with trained weights).
    * Emits (idCol, n_tokens, z); empty documents score null tokens
    * away and carry z = 0.
    */
  def scoreInline(docs: DataFrame, weights: Map[String, BigDecimal],
                  idCol: String = "doc_id",
                  textCol: String = "text",
                  prefixLen: Int = 2,
                  gram: Int = 1): DataFrame = {
    val toks = filter(graft.functions.Text.tokens(col(textCol)),
      t => t =!= "")
    docs.select(col(idCol), size(toks).cast("long").as("n_tokens"),
      zInline(col(textCol), weights, prefixLen, gram).as("z"))
  }

  /** The per-row exact-decimal logit as a bare COLUMN — the piece a
    * curation chain composes into its decision frame
    * ([[graft.Pipelines.curatePolicyDecisions]]'s classifier stage):
    * the same fold [[scoreInline]] emits, usable wherever the text
    * column already lives (no join, no shuffle, streaming-legal).
    * Deployment decides on the DECIMAL sign: `zInline(...) > 0`.
    */
  def zInline(text: org.apache.spark.sql.Column,
              weights: Map[String, BigDecimal],
              prefixLen: Int = 2,
              gram: Int = 1): org.apache.spark.sql.Column = {
    // O(1) per-token lookup: a literal MAP's try_element_at is a
    // linear scan of all 16^prefixLen entries PER TOKEN; the bucket
    // id IS the hex value of the md5 prefix, so the weight map
    // flattens to a plan-literal ARRAY indexed positionally by
    // conv(prefix, 16, 10). Missing buckets fill with the exact 0 the
    // map-miss coalesce supplied — the summed values are identical
    // decimals, so results are bit-identical to the map form. A
    // bigram-space model folds over the 2-shingles of the same
    // non-empty token stream (the hashedFeatures stream, so the
    // fold == aggregation law holds per space).
    val arr = typedLit(bucketSpace(prefixLen)
      .map(b => weights.getOrElse(b, BigDecimal(0).setScale(6))))
    val toks = filter(graft.functions.Text.tokens(text), t => t =!= "")
    val units =
      if (gram == 1) toks else graft.functions.Text.shingles(toks, gram)
    aggregate(units, lit(0).cast("decimal(38,6)"),
      (acc, t) => (acc + element_at(arr,
        conv(substring(md5(t), 1, prefixLen), 16, 10).cast("int") + 1)
          .cast("decimal(12,6)")).cast("decimal(38,6)"))
  }

  /** The rank-based evaluation battery over any labeled document
    * frame: Mann-Whitney AUC from doubled midranks over the
    * distinct-logit histogram ([[graft.operators.Ranks.prefixSums]] —
    * u_x2 = 2U and auc_ppm are EXACT integers), plus the confusion
    * and precision/recall at the z > 0 deployment threshold. One
    * scoring scan + a value-grid prefix sum + two single-row aggs —
    * the monitoring half of training (`t_quality_auc` gates it; the
    * `model eval` CLI verb serves it).
    */
  def evalReport(docs: DataFrame, weights: Map[String, BigDecimal],
                 label: org.apache.spark.sql.Column,
                 idCol: String = "doc_id",
                 textCol: String = "text",
                 gram: Int = 1,
                 threshold: Option[BigDecimal] = None): DataFrame = {
    // confusion at the artifact's own operating point: keep iff
    // z >= stored threshold, or the legacy sign z > 0 when none —
    // the Trained.keepsZ contract (defaults reproduce the original
    // z > 0 report bit-for-bit)
    val keeps = Trained(weights, spaceOf(gram), threshold)
      .keepsZ(col("z"))
    val scored = scoreInline(docs, weights, idCol, textCol, 2, gram)
      .filter(col("n_tokens") >= gram)
      .join(docs.select(col(idCol), label.as("__y")), idCol)
      .select(col("z"), col("__y").as("y"))
      .localCheckpoint(false) // z-histogram + threshold metrics
    val hist = scored.groupBy("z").agg(
        sum(when(col("y"), 1L).otherwise(0L)).as("cp"),
        sum(when(!col("y"), 1L).otherwise(0L)).as("cn"))
      .withColumn("cnt", col("cp") + col("cn"))
    val ranked = Ranks.prefixSums(hist, "z", Seq("cnt"))
      .withColumn("rank_x2", lit(2L) * col("pre_cnt") + col("cnt") + 1L)
    val thr = scored.groupBy().agg(
      sum(when(col("y") && keeps, 1L).otherwise(0L)).as("tp"),
      sum(when(!col("y") && keeps, 1L).otherwise(0L)).as("fp"),
      sum(when(col("y") && !keeps, 1L).otherwise(0L)).as("fn"),
      sum(when(!col("y") && !keeps, 1L).otherwise(0L)).as("tn"))
    ranked.groupBy()
      .agg(sum(col("cp") * col("rank_x2")).as("rp_x2"),
        sum("cp").as("n_pos"), sum("cn").as("n_neg"))
      .crossJoin(broadcast(thr))
      .withColumn("u_x2",
        col("rp_x2") - col("n_pos") * (col("n_pos") + 1L))
      .withColumn("auc_ppm",
        // single-class eval split: AUC is undefined (null), never a
        // division error — the precision/recall guards' treatment
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("u_x2 * 500000 div (n_pos * n_neg)")))
      .withColumn("precision_ppm", when(col("tp") + col("fp") > 0,
        expr("tp * 1000000 div (tp + fp)")))
      .withColumn("recall_ppm", when(col("tp") + col("fn") > 0,
        expr("tp * 1000000 div (tp + fn)")))
      .select(col("n_pos"), col("n_neg"), col("u_x2"), col("auc_ppm"),
        col("tp"), col("fp"), col("fn"), col("tn"),
        col("precision_ppm"), col("recall_ppm"))
  }

  /** Exact-decimal mean log-loss of a weight map over the feature
    * table (ln rounded to 9 dp before the exact sum — the monitoring
    * number an epoch loop logs).
    */
  def logLoss(spark: SparkSession, feats: DataFrame,
              weights: Map[String, BigDecimal], nDocs: Long,
              idCol: String = "doc_id"): Double = {
    val z = score(feats, weights, idCol)
    val p = round(lit(1.0) / (lit(1.0) + exp(-col("z").cast("double"))), 9)
    // clamp away from {0,1} so the loss stays finite
    val pc = least(greatest(p, lit(1e-9)), lit(1.0) - lit(1e-9))
    val row = z.select(
      sum(round(when(col("y") === 1, -log(pc))
        .otherwise(-log(lit(1.0) - pc)), 9).cast("decimal(28,9)"))
        .as("s")).collect()(0)
    (BigDecimal(row.getDecimal(0)) / BigDecimal(nDocs)).toDouble
  }
}

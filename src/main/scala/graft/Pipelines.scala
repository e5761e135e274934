package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.MoveResult
import graft.operators.{MoveSink, Paths, Select}
import graft.sources.{Listing, Manifest}

/** The reference's two entry points re-expressed as one declarative plan
  * shape each (SURVEY.md §3): read → filter/join → path rewrite →
  * mapPartitions sink → report DataFrame. Control crosses driver →
  * executors exactly once (at the action); every per-file HTTP probe or
  * sequential driver loop in the reference becomes a distributed scan,
  * join, or task.
  */
object Pipelines {

  /** Pipeline A (app/app.py:156-199): manifest-driven archive copy.
    *
    * The reference's 10,618 sequential `exists()` probes
    * (app/app.py:119-131) become ONE left-semi / left-anti join of the
    * manifest against a listing of the source prefix — at scale the
    * manifest side is small and broadcast, so existence is checked in a
    * single distributed pass with no shuffle of the listing.
    *
    * @param lakeRoot  filesystem root the relative blob paths live under
    *                  (stand-in for the container; file:/ in tests)
    * @return (found, notFound, results): found/notFound carry the
    *         relative blob `path`; results is None when dryRun.
    */
  def pipelineA(spark: SparkSession, manifestCsv: String, lakeRoot: String,
                sourcePrefix: String, targetPrefix: String,
                mode: MoveSink.Mode = MoveSink.Copy, dryRun: Boolean = false,
                fileIndex: Option[Dataset[graft.model.LakeFile]] = None)
      : (DataFrame, DataFrame, Option[Dataset[MoveResult]]) = {
    val root = lakeRoot.replaceAll("/+$", "")
    val manifest = Manifest.blobPaths(Manifest.read(spark, manifestCsv), sourcePrefix)

    // listing restricted to the source prefix (partition-pruned scan),
    // distributed across tasks — no driver-side file buffer. A persisted
    // file-index table (Listing.readIndex) substitutes for the live walk
    // at billion-file scale; the manifest semi-join below restricts it
    // to the source prefix either way.
    val listed = fileIndex
      .getOrElse(Listing.listDistributed(spark, s"$root/$sourcePrefix"))
      .select(regexp_replace(col("name"), "^" + java.util.regex.Pattern.quote(
        new org.apache.hadoop.fs.Path(root).toUri.getPath + "/"), "").as("path"))

    val found    = manifest.join(listed, Seq("path"), "left_semi")
    val notFound = manifest.join(listed, Seq("path"), "left_anti")

    val plan = found.select(
      concat(lit(root + "/"), col("path")).as("src"),
      concat(lit(root + "/"),
        Paths.rewriteFirstOccurrence(col("path"), sourcePrefix, targetPrefix)).as("dst"))

    val results = if (dryRun) None else Some(MoveSink.run(plan, mode))
    (found, notFound, results)
  }

  /** Pipeline B (app/main.py:229-320): filter-and-move.
    *
    * The reference's sequential filter loop (app/main.py:242-260) with
    * its double content download (app/main.py:57,176) becomes one
    * distributed `binaryFile` scan carrying (path, modificationTime,
    * content) — each file's bytes are read once, in executors.
    *
    * @return (decisions, results): decisions has
    *         (src, dst, keep, reason) for every listed file — the
    *         observable replacement for the interactive confirmation
    *         (X5, app/main.py:269-272); results is None when dryRun.
    */
  def pipelineB(spark: SparkSession, lakeRoot: String,
                sourcePath: String, targetPath: String,
                after: Option[Timestamp] = None, before: Option[Timestamp] = None,
                companyId: Option[String] = None, dryRun: Boolean = false)
      : (DataFrame, Option[Dataset[MoveResult]]) = {
    val root = lakeRoot.replaceAll("/+$", "")
    val files = Listing.withContent(spark, s"$root/$sourcePath")
    val decisions = decisionsOf(files, root, sourcePath, targetPath,
      after, before, companyId)
    val results =
      if (dryRun) None
      else Some(MoveSink.run(decisions.filter(col("keep")), MoveSink.Move))
    (decisions, results)
  }

  /** The per-file decision plan shared by batch and streaming pipeline
    * B: lake-relative path, rewritten destination, (keep, reason).
    * Works on any DataFrame with binaryFile's columns
    * (path, modificationTime, content) — batch scan or file stream.
    */
  private def decisionsOf(files: DataFrame, root: String,
                          sourcePath: String, targetPath: String,
                          after: Option[Timestamp], before: Option[Timestamp],
                          companyId: Option[String]): DataFrame = {
    // binaryFile's `path` is a full URI; strip scheme + authority
    // (e.g. abfss://container@acct.dfs.core.windows.net) then the root's
    // own path, leaving the lake-relative path pipelineA also uses
    val withRel = files
      .withColumn("rel", regexp_replace(regexp_replace(
        regexp_replace(col("path"), "^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?", ""),
        "^" + java.util.regex.Pattern.quote(
          new org.apache.hadoop.fs.Path(root).toUri.getPath), ""), "^/+", ""))
    // O13 date: binaryFile has no creation time — modificationTime is the
    // coalesced file date (reference fallback app/main.py:122-124).
    val (keep, reason) = Select.selection(
      col("modificationTime"), decode(col("content"), "UTF-8"),
      after, before, "SalesCompanyId", companyId)
    withRel.select(
      col("path").as("src"),
      concat(lit(root + "/"), regexp_replace(
        Paths.rewriteRelocate(col("rel"), sourcePath, targetPath), "^/+", "")).as("dst"),
      keep.as("keep"), reason.as("reason"))
  }

  /** Streaming pipeline B: the same filter-and-move, continuously —
    * files arriving under the source prefix are scanned ONCE (streaming
    * binaryFile source, checkpointed exactly-once bookkeeping), their
    * decisions computed with the identical plan as the batch form, and
    * each micro-batch's keepers moved by the distributed sink inside
    * `foreachBatch`; per-file MoveResults append to a durable parquet
    * report. Skipped files stay in place (unlike `cleanSource=archive`,
    * which would relocate everything) — this is the reference's
    * selective-move contract running as continuous ingestion.
    *
    * Returns a configured-but-unstarted `DataStreamWriter`: the caller
    * picks the trigger and calls `.start()` (use
    * `.trigger(Trigger.AvailableNow).start()` + `awaitTermination` to
    * drain a backlog once).
    */
  def pipelineBStream(spark: SparkSession, lakeRoot: String,
                      sourcePath: String, targetPath: String,
                      checkpointDir: String, reportDir: String,
                      after: Option[Timestamp] = None,
                      before: Option[Timestamp] = None,
                      companyId: Option[String] = None,
                      maxFilesPerTrigger: Int = 50)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val root = lakeRoot.replaceAll("/+$", "")
    // streaming file sources require an explicit schema; binaryFile's
    // is fixed by the format
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val files = spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(s"$root/$sourcePath")
    val decisions = decisionsOf(files, root, sourcePath, targetPath,
      after, before, companyId)
    decisions.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        MoveSink.run(batch.filter(col("keep")), MoveSink.Move)
          .write.mode("append").parquet(reportDir)
      }
  }

  /** Pipeline C — corpus curation, the training-data sibling of the
    * file movers: raw crawl payloads (markup in `textCol`) go through
    * the ingest chain the engine's screens define — markup strip
    * (native HtmlToText walk) → mojibake repair → PII census → Gopher
    * structural quality — and a document is KEPT when it passes
    * quality and carries no PII. Every stage is a stateless map-side
    * native expression or regex projection (no UDF, no shuffle), so
    * the decision pass is one scan; the same chain is streaming-legal
    * per stage (CurationStream.{htmlScreen,mojibakeRepair,piiScreen}).
    *
    * @return (decisions, written): decisions has (idCol, clean,
    *         had_markup, repaired, has_pii, quality_ok, keep) for
    *         every input document — the auditable replacement for a
    *         silent drop; written = rows persisted to `output`
    *         (kept docs as (idCol, text)), None when dryRun.
    */
  /** The curation decision projection — STATELESS column algebra, so
    * it runs identically on a static or a streaming DataFrame (that
    * sameness is the batch/stream equivalence
    * `CurationStream.curateScreen` exposes and StreamingSpec proves).
    */
  def curateDecisions(raw: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    import graft.expressions.{HtmlExprs, TextExprs}
    import graft.functions.Text
    val stripped = HtmlExprs.htmlToText(col(textCol))
    raw
      .select(col(idCol), col(textCol).as("__raw"), stripped.as("__st"),
        TextExprs.fixMojibake(stripped).as("clean"))
      .withColumn("had_markup", col("__st") =!= col("__raw"))
      .withColumn("repaired", col("clean") =!= col("__st"))
      .withColumn("has_pii", {
        val c = Text.piiCounts(col("clean"))
        c.getField("n_emails") + c.getField("n_phones") +
          c.getField("n_ipv4") + c.getField("n_cards") > 0
      })
      .withColumn("quality_ok",
        Text.gopherKeep(col("clean"), Text.tokens(col("clean"))))
      .withColumn("keep", col("quality_ok") && !col("has_pii"))
      .drop("__raw", "__st")
  }

  def pipelineC(spark: SparkSession, input: String, output: String,
                dryRun: Boolean = false, idCol: String = "doc_id",
                textCol: String = "text"): (DataFrame, Option[Long]) = {
    val decisions =
      curateDecisions(spark.read.parquet(input), idCol, textCol)
    if (dryRun) (decisions, None)
    else {
      val kept = decisions.filter(col("keep"))
        .select(col(idCol), col("clean").as(textCol))
      kept.write.mode("overwrite").parquet(output)
      (decisions, Some(spark.read.parquet(output).count()))
    }
  }

  /** The funnel report over [[pipelineC]] decisions — the per-stage
    * counts an ingest job logs (and alerts on) every day.
    */
  def curationReport(decisions: DataFrame): DataFrame = {
    val d = decisions.agg(
      count(lit(1)).as("ingested"),
      sum(when(col("had_markup"), 1L).otherwise(0L)).as("markup_stripped"),
      sum(when(col("repaired"), 1L).otherwise(0L)).as("mojibake_repaired"),
      sum(when(col("has_pii"), 1L).otherwise(0L)).as("pii_flagged"),
      sum(when(!col("quality_ok"), 1L).otherwise(0L)).as("quality_failed"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
    val stages = Seq("ingested", "markup_stripped", "mojibake_repaired",
      "pii_flagged", "quality_failed", "kept")
    d.select(explode(array(stages.map(s =>
        struct(lit(s).as("stage"), col(s).as("n"))): _*)).as("r"))
      .select(col("r.stage").as("stage"), col("r.n").as("n"))
  }
}

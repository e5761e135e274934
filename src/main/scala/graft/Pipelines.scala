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
                mode: MoveSink.Mode = MoveSink.Copy, dryRun: Boolean = false)
      : (DataFrame, DataFrame, Option[Dataset[MoveResult]]) = {
    val root = lakeRoot.replaceAll("/+$", "")
    val manifest = Manifest.blobPaths(Manifest.read(spark, manifestCsv), sourcePrefix)

    // listing restricted to the source prefix (partition-pruned scan),
    // distributed across tasks — no driver-side file buffer
    val listed = Listing.listDistributed(spark, s"$root/$sourcePrefix")
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
    // binaryFile's `path` is a full URI; strip scheme + authority
    // (e.g. abfss://container@acct.dfs.core.windows.net) then the root's
    // own path, leaving the lake-relative path pipelineA also uses
    val files = Listing.withContent(spark, s"$root/$sourcePath")
      .withColumn("rel", regexp_replace(regexp_replace(
        regexp_replace(col("path"), "^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?", ""),
        "^" + java.util.regex.Pattern.quote(
          new org.apache.hadoop.fs.Path(root).toUri.getPath), ""), "^/+", ""))

    // O13 date: binaryFile has no creation time — modificationTime is the
    // coalesced file date (reference fallback app/main.py:122-124).
    val (keep, reason) = Select.selection(
      col("modificationTime"), decode(col("content"), "UTF-8"),
      after, before, "SalesCompanyId", companyId)

    val decisions = files.select(
      col("path").as("src"),
      concat(lit(root + "/"), regexp_replace(
        Paths.rewriteRelocate(col("rel"), sourcePath, targetPath), "^/+", "")).as("dst"),
      keep.as("keep"), reason.as("reason"))

    val results =
      if (dryRun) None
      else Some(MoveSink.run(decisions.filter(col("keep")), MoveSink.Move))
    (decisions, results)
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{MoveSink, Report}

/** Thin operational entry point — the drop-in equivalent of the
  * reference's env-driven scripts (app/config.py via .env;
  * app/main.py:20-29's filter/target knobs; app/app.py's manifest
  * pipeline). The engine itself stays a parameter-driven library;
  * this main only resolves knobs (flags first, `GRAFT_*` environment
  * variables as fallback — mirroring the reference's .env contract),
  * prints the resolved config like the reference does, runs the
  * pipeline, and prints the status report.
  *
  * Usage:
  *   graft.Main pipelineA --lake-root URI --manifest CSV
  *     --source PREFIX --target PREFIX [--mode copy|copyasync|move]
  *     [--dry-run]
  *   graft.Main pipelineB --lake-root URI --source PREFIX
  *     --target PREFIX [--after 'yyyy-MM-dd HH:mm:ss']
  *     [--before 'yyyy-MM-dd HH:mm:ss'] [--company-id ID] [--dry-run]
  *
  * Env fallbacks: GRAFT_LAKE_ROOT, GRAFT_MANIFEST, GRAFT_SOURCE_PATH,
  * GRAFT_TARGET_PATH, GRAFT_FILTER_AFTER, GRAFT_FILTER_BEFORE,
  * GRAFT_COMPANY_ID, GRAFT_MODE, GRAFT_DRY_RUN.
  */
object Main {

  final case class Config(
      pipeline: String,
      lakeRoot: String,
      manifest: Option[String],
      source: String,
      target: String,
      after: Option[Timestamp],
      before: Option[Timestamp],
      companyId: Option[String],
      mode: MoveSink.Mode,
      dryRun: Boolean)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  /** Flags beat env vars; both mirror the reference's knob names. */
  private[graft] def parse(args: Seq[String],
                           env: Map[String, String] = sys.env): Config = {
    if (args.isEmpty) fail("missing pipeline: pipelineA | pipelineB")
    val pipeline = args.head match {
      case p @ ("pipelineA" | "pipelineB") => p
      case other => fail(s"unknown pipeline: $other")
    }
    val flags = scala.collection.mutable.Map.empty[String, String]
    var rest = args.tail
    while (rest.nonEmpty) rest match {
      case "--dry-run" +: t => flags += "dry-run" -> "true"; rest = t
      case flag +: v +: t if flag.startsWith("--") =>
        flags += flag.stripPrefix("--") -> v; rest = t
      case other +: _ => fail(s"unexpected argument: $other")
    }
    def knob(flag: String, envKey: String): Option[String] =
      flags.get(flag).orElse(env.get(envKey)).filter(_.nonEmpty)
    def required(flag: String, envKey: String): String =
      knob(flag, envKey).getOrElse(fail(s"missing --$flag (or $envKey)"))
    def ts(flag: String, envKey: String): Option[Timestamp] =
      knob(flag, envKey).map { s =>
        Timestamp.valueOf(if (s.contains(" ")) s else s + " 00:00:00")
      }
    val mode = knob("mode", "GRAFT_MODE").map(_.toLowerCase) match {
      case None | Some("copy") => MoveSink.Copy
      case Some("copyasync")   => MoveSink.CopyAsync
      case Some("move")        => MoveSink.Move
      case Some(other)         => fail(s"unknown mode: $other")
    }
    Config(
      pipeline = pipeline,
      lakeRoot = required("lake-root", "GRAFT_LAKE_ROOT"),
      manifest = knob("manifest", "GRAFT_MANIFEST"),
      source = required("source", "GRAFT_SOURCE_PATH"),
      target = required("target", "GRAFT_TARGET_PATH"),
      after = ts("after", "GRAFT_FILTER_AFTER"),
      before = ts("before", "GRAFT_FILTER_BEFORE"),
      companyId = knob("company-id", "GRAFT_COMPANY_ID"),
      mode = mode,
      dryRun = flags.contains("dry-run") ||
        env.get("GRAFT_DRY_RUN").exists(_.equalsIgnoreCase("true")))
  }

  /** Run the configured pipeline; returns the status report (dry runs
    * report the would-be decisions instead of executing).
    */
  private[graft] def run(spark: SparkSession, cfg: Config): DataFrame = {
    import org.apache.spark.sql.functions._
    cfg.pipeline match {
      case "pipelineA" =>
        val manifest = cfg.manifest.getOrElse(
          fail("pipelineA needs --manifest (or GRAFT_MANIFEST)"))
        val (found, notFound, results) = Pipelines.pipelineA(
          spark, manifest, cfg.lakeRoot, cfg.source, cfg.target,
          cfg.mode, cfg.dryRun)
        results match {
          case Some(r) => Report.statusCounts(r)
          case None => // dry run: found/not-found counts, no side effects
            found.select(lit("found").as("status"))
              .groupBy("status").agg(count(lit(1)).as("n"), lit(0L).as("bytes"))
              .union(notFound
                .select(lit("not_found").as("status"))
                .groupBy("status").agg(count(lit(1)).as("n"), lit(0L).as("bytes")))
        }
      case "pipelineB" =>
        val (decisions, results) = Pipelines.pipelineB(
          spark, cfg.lakeRoot, cfg.source, cfg.target,
          cfg.after, cfg.before, cfg.companyId, cfg.dryRun)
        results match {
          case Some(r) => Report.statusCounts(r)
          case None => // dry run: keep/skip decision counts
            decisions
              .select(when(col("keep"), lit("would_move"))
                .otherwise(lit("skipped")).as("status"))
              .groupBy("status").agg(count(lit(1)).as("n"), lit(0L).as("bytes"))
        }
    }
  }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args.toSeq)
    // the reference prints its resolved knobs before acting
    // (app/main.py:30-38) — same contract, secrets-free
    println(s"Pipeline:    ${cfg.pipeline}${if (cfg.dryRun) " (dry run)" else ""}")
    println(s"Lake root:   ${cfg.lakeRoot}")
    cfg.manifest.foreach(m => println(s"Manifest:    $m"))
    println(s"Source path: ${cfg.source}")
    println(s"Target path: ${cfg.target}")
    cfg.after.foreach(a => println(s"Filter files uploaded after: $a"))
    cfg.before.foreach(b => println(s"Filter files uploaded before: $b"))
    cfg.companyId.foreach(c => println(s"Filter by SalesCompanyId: $c"))

    val builder = SparkSession.builder()
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    sys.env.get("GRAFT_MASTER").orElse(Some("local[*]"))
      .foreach(builder.master)
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, cfg).show(truncate = false)
    finally spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality metrics (Deequ-style), computed scan-once.
  *
  * A quality gate over a 100 TB table must not cost one job per rule:
  * every requested metric here compiles into a single wide aggregation
  * over one scan (completeness, uniqueness, numeric profile, boolean
  * rule assertions all map-combine), and the 1-row wide result is
  * exploded to the long (metric, value) report form driver-side-free.
  * Referential integrity is the one rule that inherently needs a second
  * table; it runs as a broadcast/shuffled anti-join count, not a scan
  * per key.
  *
  * All metric values are DOUBLE so the report schema is stable across
  * rule types (ratios, counts, extrema, 0/1 assertions).
  */
object Quality {

  /** Non-null ratio per column (1.0 = fully populated). */
  private def completenessExpr(c: String): Column =
    count(col(c)).cast("double") / count(lit(1)).cast("double")

  /** Exact distinct ratio per column (1.0 = key candidate). */
  private def uniquenessExpr(c: String): Column =
    count_distinct(col(c)).cast("double") / count(lit(1)).cast("double")

  /** One-pass metric report, long form (metric, value).
    *
    * @param completenessCols columns scored count(col)/count(*)
    * @param uniquenessCols   columns scored countDistinct/count(*)
    * @param numericCols      columns profiled min/max/mean (mean uses
    *                         exact DECIMAL sums so the value is
    *                         partition-order independent)
    * @param assertions       named boolean rules over the whole table,
    *                         e.g. "value_non_negative" -> min(v) >= 0;
    *                         reported as 1.0 (holds) / 0.0 (violated)
    */
  def metrics(df: DataFrame,
              completenessCols: Seq[String] = Nil,
              uniquenessCols: Seq[String] = Nil,
              numericCols: Seq[String] = Nil,
              assertions: Seq[(String, Column)] = Nil): DataFrame = {
    val pairs: Seq[(String, Column)] =
      completenessCols.map(c => s"completeness_$c" -> completenessExpr(c)) ++
      uniquenessCols.map(c => s"uniqueness_$c" -> uniquenessExpr(c)) ++
      numericCols.flatMap(c => Seq(
        s"min_$c" -> min(col(c)).cast("double"),
        s"max_$c" -> max(col(c)).cast("double"),
        s"mean_$c" -> (sum(col(c).cast("decimal(18,6)")).cast("double") /
          count(col(c)).cast("double")))) ++
      // NULL rule results (empty table, all-null column) report as 0.0
      // — "not proven to hold" — matching the oracle's CASE...ELSE 0
      assertions.map { case (n, rule) =>
        n -> coalesce(rule.cast("double"), lit(0.0)) }
    require(pairs.nonEmpty, "no metrics requested")
    val kvs = pairs.flatMap { case (n, e) => Seq(lit(n), e) }
    df.agg(map(kvs: _*).as("m"))
      .select(explode(col("m")).as(Seq("metric", "value")))
  }

  /** Referential integrity of child.key → parent.pkey as (metric, value)
    * rows: orphan row count and orphan ratio. Null child keys are not
    * orphans (SQL FK semantics). */
  def referentialIntegrity(child: DataFrame, key: String,
                           parent: DataFrame, pkey: String,
                           name: String): DataFrame = {
    val total = child.agg(count(lit(1)).cast("double").as("total"))
    val orphans = child.filter(col(key).isNotNull)
      .join(parent.select(col(pkey).as(key)).distinct(), Seq(key), "left_anti")
      .agg(count(lit(1)).cast("double").as("orphans"))
    orphans.crossJoin(total).select(
      explode(map(
        lit(s"orphans_$name"), col("orphans"),
        lit(s"orphan_ratio_$name"), col("orphans") / col("total")))
        .as(Seq("metric", "value")))
  }

  /** Per-key robust location/scale: (keyCol, med, mad) via exact
    * interpolating percentiles — median of the values, then median of
    * absolute deviations. The single source of the fit used by BOTH
    * the batch outlier query (joined back distributed) and the
    * streaming screen (collected to plan literals) — one formula, so
    * a fit change cannot silently diverge the batch/stream parity.
    * At 100 TB swap `percentile` for `approx_percentile` HERE and
    * both paths follow.
    */
  def robustStats(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val med = df.groupBy(keyCol)
      .agg(expr(s"percentile($valCol, 0.5d)").as("med"))
    df.join(broadcast(med), keyCol)
      .groupBy(keyCol)
      .agg(first(col("med")).as("med"),
        expr(s"percentile(abs($valCol - med), 0.5d)").as("mad"))
  }

  // ---- per-source governance rollup (batch + streaming-safe split) ----

  /** First-level domain ledger: one row per (content hash, source) with
    * the doc count and per-doc-attribute tallies. This is the ONLY
    * corpus-sized aggregation of the rollup, and it is a single
    * streaming-legal groupBy — the state a monitor keeps at ingest is
    * exactly this frame (|distinct texts| rows, not |docs|). The
    * second level ([[domainRollup]]) runs on the ledger SNAPSHOT —
    * vocabulary-sized — per micro-batch via foreachBatch, or once in
    * batch.
    */
  def domainLedger(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("h"), col("source"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("n_chars") < 200, 1L).otherwise(0L)).as("shorts"),
        sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("nonens"))

  /** Second-level rollup of a [[domainLedger]] snapshot to per-source
    * stats + the threshold keep rule. Dup membership is GLOBAL by
    * hash (a text duplicated across sources marks every copy), so the
    * total count per hash is rebuilt with one vocabulary-sized agg +
    * equi-join before the per-source rollup. Shares are exact ppm.
    */
  def domainRollup(ledger: DataFrame): DataFrame = {
    // renamed key on the totals branch: a plain self-join on "h" hits
    // conflicting-attribute resolution when the ledger is a named view
    // (e.g. the streaming memory-sink snapshot)
    val totals = ledger.select(col("h").as("__th"), col("cnt"))
      .groupBy("__th").agg(sum(col("cnt")).as("total"))
    ledger.join(totals, col("h") === col("__th")).drop("__th")
      .groupBy("source")
      .agg(sum(col("cnt")).as("n_docs"),
        sum(when(col("total") > 1, col("cnt")).otherwise(0L)).as("dup_docs"),
        sum(col("shorts")).as("short_docs"),
        sum(col("nonens")).as("nonen_docs"))
      .withColumn("dup_ppm", expr("dup_docs * 1000000L div n_docs"))
      .withColumn("short_ppm", expr("short_docs * 1000000L div n_docs"))
      .withColumn("nonen_ppm", expr("nonen_docs * 1000000L div n_docs"))
      .withColumn("keep",
        col("dup_ppm") <= 300000L && col("short_ppm") <= 400000L &&
          col("nonen_ppm") <= 600000L)
  }
}

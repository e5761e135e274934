package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BANDED per-key ordered computations — the skew armor for keyed
  * windows ordered by a deterministic HASH of a column: partitioning
  * additionally by a short PREFIX of the very hash that orders the
  * rows splits a mega-key's sort across up to 256 tasks, and because
  * the band is a prefix of the primary sort key, band-then-within-band
  * order IS the key's global order row for row. The cross-band
  * correction (each band's rank/sum offset = the closed-form aggregate
  * of its predecessors) lives on a keys × ≤256-row frame — keyed
  * window + keyed join, never corpus-global. The banded input is
  * lazily localCheckpoint'd because it feeds both the offsets
  * aggregate and the outer join (without it the entire upstream
  * subtree executes once per branch).
  *
  * Two shapes share the machinery:
  *   - [[rank]]: `row_number` over (keys) ordered by
  *     (md5(order), order) — the crawl schedule / curation quota
  *     shape, where EVERY row keeps its rank (a rank that is
  *     immediately filtered to top-k does NOT need this: Catalyst
  *     rewrites rank ≤ k to WindowGroupLimit);
  *   - [[prefixSum]]: the INCLUSIVE running sum of a value column
  *     over the same order — the token-budget / epoch-remainder
  *     shape, which WindowGroupLimit can never help because the
  *     cumulative value of the last row needs every predecessor.
  *     Null values are skipped exactly as the plain window sum skips
  *     them, including the null-until-first-non-null prefix.
  *
  * Key columns may be null (a null group is its own partition, like
  * the window it replaces): the offsets join is null-safe.
  */
object Banded {

  private def hashOf(c: Column): Column = md5(c.cast("string"))

  /** row_number over (keys) ordered by (md5(orderCol), orderCol),
    * computed banded; emits `out` (long, 1-based) with the input
    * columns preserved.
    */
  def rank(df: DataFrame, keys: Seq[String], orderCol: String,
           out: String): DataFrame =
    bandedOver(df, keys, orderCol, out,
      inWindow = w => row_number().over(w).cast("long"),
      perBand = count(lit(1)),
      // a rank is never null; only the first band lacks predecessors
      combine = (off, in) => coalesce(off, lit(0L)) + in)

  /** Inclusive running sum of `value` over (keys) ordered by
    * (md5(orderCol), orderCol), computed banded; emits `out` (long).
    */
  def prefixSum(df: DataFrame, keys: Seq[String], orderCol: String,
                value: Column, out: String): DataFrame =
    bandedOver(df.withColumn(s"__v_$out", value.cast("long")), keys,
      orderCol, out,
      inWindow = w => sum(col(s"__v_$out"))
        .over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)),
      perBand = sum(col(s"__v_$out")),
      // null iff NO non-null value at-or-before this row (the plain
      // window's skip-null semantics): in-band cum null AND no
      // non-null predecessor band
      combine = (off, in) => when(in.isNull && off.isNull,
          lit(null).cast("long"))
        .otherwise(coalesce(in, lit(0L)) + coalesce(off, lit(0L))))
      .drop(s"__v_$out")

  private def bandedOver(df: DataFrame, keys: Seq[String],
                         orderCol: String, out: String,
                         inWindow: org.apache.spark.sql.expressions
                           .WindowSpec => Column,
                         perBand: Column,
                         combine: (Column, Column) => Column)
      : DataFrame = {
    val band = s"__band_$out"
    val wIn = Window.partitionBy((keys :+ band).map(col): _*)
      .orderBy(hashOf(col(orderCol)).asc, col(orderCol).asc)
    val banded = df
      .withColumn(band, substring(hashOf(col(orderCol)), 1, 2))
      .withColumn(s"__in_$out", inWindow(wIn))
      .localCheckpoint(false)
    val wOff = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(band).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keys.zipWithIndex.foldLeft(
        banded.groupBy((keys :+ band).map(col): _*)
          .agg(perBand.as(s"__bv_$out"))
          .withColumn(s"__off_$out", sum(col(s"__bv_$out")).over(wOff))
          .drop(s"__bv_$out")) {
        case (d, (k, i)) => d.withColumnRenamed(k, s"__k${i}_$out")
      }
      .withColumnRenamed(band, s"__kb_$out")
    val cond = (keys.zipWithIndex.map { case (k, i) =>
        col(k) <=> col(s"__k${i}_$out") } :+
        (col(band) <=> col(s"__kb_$out"))).reduce(_ && _)
    banded.join(offsets, cond)
      .withColumn(out, combine(col(s"__off_$out"), col(s"__in_$out")))
      .drop((keys.indices.map(i => s"__k${i}_$out") ++
        Seq(s"__kb_$out", band, s"__in_$out", s"__off_$out")): _*)
  }
}

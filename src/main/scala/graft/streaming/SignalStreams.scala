package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins for the signal-processing monitors.
  *
  * The batch `e_cusum_changepoint` computes its target μ from the
  * whole series — fine for a retrospective screen, impossible
  * prospectively. The deployed pattern is FIT OFFLINE, MONITOR ONLINE:
  * the reference target comes from history (the batch query over last
  * month), and the stream folds completed hourly buckets through the
  * textbook recursion with O(1) state. Given the same target and
  * in-order bucket delivery, the streamed rows are bit-identical to
  * the batch closed form — spec-proven across micro-batches.
  *
  * Scale shape: state is one 3-long record per series key (here one
  * global ingest series; a fleet monitors per (source, metric) keys —
  * the groupByKey already is that shape). The hourly buckets arrive
  * from the suite's watermarked tumbling-window agg; this operator
  * never sees per-event rows.
  */
object SignalStreams {

  final case class HourRow(h: Timestamp, x: Long)
  final case class CusumState(s: Long, mn: Long, mx: Long)
  final case class CusumOut(h: Timestamp, x: Long, s_e6: Long,
                            cusum_pos_e6: Long, cusum_neg_e6: Long,
                            alarm: Int)

  /** Fold completed hourly counts through CUSUM against a FIXED
    * reference target (e6 micro-units). The state (S, min S, max S)
    * starts at (0, 0, 0) — the empty-prefix baseline the batch closed
    * form also carries, so C⁺ = S − mn and C⁻ = mx − S reproduce
    * `e_cusum_changepoint` exactly under the same target. Buckets
    * are re-sorted by hour WITHIN a micro-batch; cross-batch order is
    * the append-mode window emission order (watermark-completed hours
    * arrive in sequence).
    */
  /** Reference model for the PSI drift monitor — the "fit offline"
    * half of `q_psi_drift`: per event_type, the reference window's
    * bucket frame (lo/hi), total, and the 10 per-bucket counts. */
  final case class PsiRef(et: String, bucket: Long, lo: Double,
                          hi: Double, nRef: Long, cRef: Long)

  /** Streaming half of the PSI monitor: bucket CURRENT events against
    * the FIXED reference frame and keep per-(type, bucket) counts as
    * streaming state (complete-mode ledger — the exact shape
    * `Quality.domainLedger` uses). The corpus never accumulates;
    * state is <= types x 10 rows. */
  def psiLedger(events: DataFrame, ref: Seq[PsiRef]): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = events.sparkSession
    import spark.implicits._
    val frame = ref.map(r => (r.et, r.lo, r.hi)).distinct
      .toDF("et", "lo", "hi")
    events.select(col("et"), col("v"))
      .join(broadcast(frame), "et")
      .withColumn("bucket", least(lit(9L), greatest(lit(0L),
        floor((col("v") - col("lo")) /
          ((col("hi") - col("lo")) / lit(10.0))))))
      .groupBy("et", "bucket").agg(count(lit(1)).as("c_cur"))
  }

  /** Snapshot rollup: PSI per type from the ledger counts plus the
    * reference model — the IDENTICAL smoothing/rounding algebra as
    * the batch `q_psi_drift` (dense 10-bucket spine, +1 Laplace,
    * round-9 ln terms, exact DECIMAL sum), so a monitor fed the
    * batch's current window reproduces its rows bit-for-bit. */
  def psiRollup(ledger: DataFrame, ref: Seq[PsiRef]): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = ledger.sparkSession
    import spark.implicits._
    val grid = ref.map(r => (r.et, r.bucket, r.nRef, r.cRef))
      .toDF("et", "bucket", "n_ref", "c_ref")
    val cn = ledger.groupBy("et").agg(sum("c_cur").as("n_cur"))
    grid.join(ledger, Seq("et", "bucket"), "left")
      .na.fill(0L, Seq("c_cur"))
      .join(broadcast(cn), "et")
      .withColumn("pr", (col("c_ref") + lit(1)).cast("double") /
        (col("n_ref") + lit(10)).cast("double"))
      .withColumn("pc", (col("c_cur") + lit(1)).cast("double") /
        (col("n_cur") + lit(10)).cast("double"))
      .withColumn("term", round((col("pc") - col("pr")) *
        round(log(col("pc") / col("pr")), 9), 12))
      .groupBy("et")
      .agg(max("n_ref").as("n_ref"), max("n_cur").as("n_cur"),
        round(sum(col("term").cast("decimal(38,12)")).cast("double"), 6)
          .as("psi"))
      .select(col("et").as("event_type"), col("n_ref"), col("n_cur"),
        col("psi"))
  }

  /** Reference model for the Wasserstein drift monitor — the "fit
    * offline" half of `q_wasserstein_1d`: the corpus length-bucket
    * profile (dense 0..9 spine) and its total. */
  final case class W1Ref(bucket: Long, nRef: Long, cRef: Long)

  /** Streaming half of the 1-D Wasserstein monitor: bucket incoming
    * docs by token-count (the batch query's width-20/cap-9 frame) and
    * keep per-(source, bucket) counts as streaming state
    * (complete-mode ledger, the psiLedger shape). State is
    * ≤ sources × 10 rows; the corpus never accumulates. */
  def w1Ledger(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    docs.select(col("source"),
        least(expr("tc div 20"), lit(9L)).as("bucket"))
      .groupBy("source", "bucket").agg(count(lit(1)).as("c_cur"))
  }

  /** Snapshot rollup: per-source W1 vs the FIXED reference profile —
    * the identical exact-integer algebra as the batch
    * `q_wasserstein_1d` (dense spine, shared n·N_ref denominator, one
    * closing floor division), so a monitor fed the batch's corpus as
    * both stream and reference reproduces its rows bit-for-bit. */
  def w1Rollup(ledger: DataFrame, ref: Seq[W1Ref]): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val spark = ledger.sparkSession
    import spark.implicits._
    val grid = ref.map(r => (r.bucket, r.nRef, r.cRef))
      .toDF("bucket", "n_ref", "c_ref")
    val ns = ledger.groupBy("source").agg(sum("c_cur").as("n"))
    // re-aliased projection: the ledger appears on both sides of the
    // join (via ns), which a streaming-memory view can't self-resolve
    val led = ledger.select(col("source").as("src2"),
      col("bucket").as("b2"), col("c_cur").as("c_cur"))
    val wCum = Window.partitionBy("source").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ns.crossJoin(broadcast(grid))
      .join(led, col("source") === col("src2") &&
        col("bucket") === col("b2"), "left")
      .drop("src2", "b2")
      .na.fill(0L, Seq("c_cur"))
      .withColumn("cumk", sum("c_cur").over(wCum))
      .withColumn("cumref", sum("c_ref").over(wCum))
      .groupBy("source").agg(max("n").as("n"), max("n_ref").as("n_ref"),
        sum(abs(col("cumk") * col("n_ref") - col("cumref") * col("n")))
          .as("num"))
      .select(col("source"), col("n"),
        expr("num * 1000000L div (n * n_ref)").as("w1_e6"))
  }

  /** Streaming half of the burstiness (Fano factor) monitor: keep
    * per-(event_type, hour) counts as streaming state (complete-mode
    * ledger, the psiLedger shape — ≤ types × hours rows, bounded by
    * wall clock, never by event volume). */
  def fanoLedger(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    events
      .select(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
          .as("he"))
      .groupBy("event_type", "he").agg(count(lit(1)).as("x"))
  }

  /** Snapshot rollup: per-type Fano over the FIXED dense spine
    * [h0, h1] (fit offline — the monitored wall-clock window), zero
    * hours included, identical exact-integer algebra as the batch
    * `e_burstiness`, so a monitor fed the batch's window reproduces
    * its rows bit-for-bit. */
  def fanoRollup(ledger: DataFrame, h0: Long, h1: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val led = ledger.select(col("event_type").as("et2"),
      col("he").as("he2"), col("x"))
    ledger.select("event_type").distinct()
      .select(col("event_type"),
        explode(sequence(lit(h0), lit(h1))).as("he"))
      .join(led, col("event_type") === col("et2") &&
        col("he") === col("he2"), "left")
      .drop("et2", "he2")
      .withColumn("x", coalesce(col("x"), lit(0L)))
      .groupBy("event_type").agg(
        count(lit(1)).as("n_hours"), sum("x").as("sx"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"))
      .select(col("event_type"), col("n_hours"), col("sx").as("n_events"),
        expr("sx * 1000000L div n_hours").as("mean_e6"),
        expr("cast(round((cast(n_hours as double) " +
          "* cast(sxx as double) - cast(sx as double) " +
          "* cast(sx as double)) * 1000000 " +
          "/ (cast(n_hours as double) * cast(sx as double)), 0) " +
          "as bigint)").as("fano_e6"))
  }

  /** Holt linear-trend monitor: fold completed hourly buckets through
    * `operators/Holt.step` with an (l, b, started) state record per
    * series key. The first two observations of a key initialize the
    * state exactly as the batch fit does, so given in-order bucket
    * delivery the streamed rows are bit-identical to
    * `e_holt_linear` — spec-proven across micro-batches. State is two
    * doubles per key. */
  final case class HoltSt(l: Double, b: Double,
                          pending: Option[(Timestamp, Long)])

  def holtStream(hours: DataFrame)
      : Dataset[graft.operators.Holt.Out] = {
    import graft.operators.Holt
    import hours.sparkSession.implicits._
    hours.as[Holt.In]
      .groupByKey(_.et)
      .flatMapGroupsWithState[HoltSt, Holt.Out](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (et: String, rows: Iterator[Holt.In], state: GroupState[HoltSt]) =>
          val sorted = rows.toSeq.sortBy(_.h.getTime)
          val out = Seq.newBuilder[Holt.Out]
          var cur: Option[HoltSt] = state.getOption
          sorted.foreach { r =>
            cur match {
              case None =>
                // first observation ever: buffer it — no slope yet
                cur = Some(HoltSt(0.0, 0.0, Some((r.h, r.x))))
              case Some(HoltSt(_, _, Some((h1, x1)))) =>
                val st0 = Holt.init(x1, r.x)
                out += Holt.Out(et, h1, x1, st0.l, st0.b, None)
                val (ns, f) = Holt.step(st0, r.x)
                out += Holt.Out(et, r.h, r.x, ns.l, ns.b, Some(f))
                cur = Some(HoltSt(ns.l, ns.b, None))
              case Some(HoltSt(l, b, None)) =>
                val (ns, f) = Holt.step(Holt.State(l, b), r.x)
                out += Holt.Out(et, r.h, r.x, ns.l, ns.b, Some(f))
                cur = Some(HoltSt(ns.l, ns.b, None))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  def cusumStream(hours: DataFrame, targetE6: Long,
                  alarmMult: Long = 4L): Dataset[CusumOut] = {
    import hours.sparkSession.implicits._
    hours.as[HourRow]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[CusumState, CusumOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[HourRow], state: GroupState[CusumState]) =>
          var cur = state.getOption.getOrElse(CusumState(0L, 0L, 0L))
          val out = rows.toSeq.sortBy(_.h.getTime).map { r =>
            val s = cur.s + r.x * 1000000L - targetE6
            cur = CusumState(s, math.min(cur.mn, s), math.max(cur.mx, s))
            val pos = s - cur.mn
            val neg = cur.mx - s
            CusumOut(r.h, r.x, s, pos, neg,
              if (pos > alarmMult * targetE6 || neg > alarmMult * targetE6) 1
              else 0)
          }
          state.update(cur)
          out.iterator
      }
  }

  final case class BurnHour(he: Long, nEvents: Long, nErrors: Long)
  final case class BurnState(window: List[(Long, Long, Long)])
  final case class BurnOut(he: Long, n_events: Long, n_errors: Long,
                           err_ppm: Long, burn1h_x100: Long,
                           burn6h_x100: Long, page: Boolean)

  /** Streaming twin of `e_slo_burn` — burn-rate paging IS an online
    * monitor. Folds completed hourly (events, errors) buckets through
    * a ≤6-deep trailing window held in keyed state (one list per
    * series — O(1)), with the batch query's exact integer algebra,
    * so given in-order bucket delivery the emitted rows are
    * bit-identical to the batch window (StreamingSpec proof
    * obligation). A page fires when BOTH the 1 h and trailing-6 h
    * burns exceed their thresholds. */
  def burnStream(hours: DataFrame): Dataset[BurnOut] = {
    import hours.sparkSession.implicits._
    hours.as[BurnHour]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[BurnState, BurnOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[BurnHour], state: GroupState[BurnState]) =>
          var win = state.getOption.getOrElse(BurnState(Nil)).window
          val out = rows.toSeq.sortBy(_.he).map { r =>
            win = (win :+ ((r.he, r.nEvents, r.nErrors))).takeRight(6)
            val tot6 = win.map(_._2).sum
            val err6 = win.map(_._3).sum
            // zero-event guard: the batch twin's hourly agg can never
            // emit an empty bucket, but this public entry point accepts
            // arbitrary hourly frames (e.g. a gap-filled feed) — a
            // 0-event hour reads as 0 errors / 0 burn, not a crash.
            val errPpm = r.nErrors * 1000000L / math.max(r.nEvents, 1L)
            val b1 = errPpm / 50L
            val b6 = (err6 * 1000000L / math.max(tot6, 1L)) / 50L
            BurnOut(r.he, r.nEvents, r.nErrors, errPpm, b1, b6,
              b1 >= 1440L && b6 >= 600L)
          }
          state.update(BurnState(win))
          out.iterator
      }
  }

  final case class SprtDay(variant: Long, day: String, nTrials: Long,
                           nSucc: Long)
  final case class SprtState(cum: Long)
  final case class SprtOut(variant: Long, day: String, n_trials: Long,
                           n_succ: Long, cum_llr_e6: Long,
                           decision: String)

  /** Streaming twin of `e_sprt_ab` — the sequential test IS an online
    * procedure, so the deployed form folds completed DAILY trial
    * buckets (from the suite's watermarked daily agg) through the Wald
    * recursion with O(1) state per variant: cum += n_succ·lS +
    * n_fail·lF, decide against ±boundary. Same exact e6-integer
    * increments as the batch query (the ln literals are the caller's —
    * fit offline, monitor online), so given in-order bucket delivery
    * the emitted rows are bit-identical to the batch window — the
    * StreamingSpec proof obligation every twin in this file carries.
    */
  def sprtStream(days: DataFrame, lS: Long, lF: Long, boundE6: Long)
      : Dataset[SprtOut] = {
    import days.sparkSession.implicits._
    days.as[SprtDay]
      .groupByKey(_.variant)
      .flatMapGroupsWithState[SprtState, SprtOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (v: Long, rows: Iterator[SprtDay], state: GroupState[SprtState]) =>
          var cum = state.getOption.getOrElse(SprtState(0L)).cum
          val out = rows.toSeq.sortBy(_.day).map { r =>
            cum += r.nSucc * lS + (r.nTrials - r.nSucc) * lF
            SprtOut(v, r.day, r.nTrials, r.nSucc, cum,
              if (cum >= boundE6) "accept_h1"
              else if (cum <= -boundE6) "accept_h0"
              else "continue")
          }
          state.update(SprtState(cum))
          out.iterator
      }
  }
}

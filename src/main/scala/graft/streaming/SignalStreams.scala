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
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming trending items: per tumbling window, the top-k most
  * frequent items — the streaming counterpart of the batch
  * HeavyHitters/TopK pair.
  *
  * State design for unbounded item cardinality: each open window holds
  * a Misra–Gries summary of `capacity` counters (same sketch as the
  * batch operator), NOT a full item→count map — state per window is
  * O(capacity) regardless of how many distinct items the stream carries
  * (the property that keeps a URL/token stream from growing state
  * without bound). Counts for items that stay in the summary the whole
  * window are exact; any item whose true count exceeds
  * n_window/(capacity+1) is guaranteed present (the batch operator's
  * guarantee, per window). The window EMITS on an event-time timeout
  * once the watermark passes its end — late data inside the watermark
  * still counts, and replay/backfill behaves identically to live runs.
  */
object Trending {

  final case class ItemEvent(ts: Timestamp, item: String)
  final case class WindowTop(window_start: Timestamp, rank: Int,
                             item: String, approx_count: Long)
  // State as parallel arrays, and NOT private: the state encoder's
  // generated code lives outside this object, so a private state class
  // fails janino compilation (the working SessionState in EventStreams
  // is public for the same reason).
  final case class MgState(items: Array[String],
                           counts: Array[Long], n: Long)

  /** Top-k items per `windowSeconds` tumbling window over an
    * append-only stream of (ts, item). Emits one batch of k rows per
    * window when the watermark closes it.
    */
  def windowTopK(events: Dataset[ItemEvent], k: Int,
                 windowSeconds: Long = 3600, capacity: Int = 1024,
                 watermarkDelay: String = "10 minutes")
      : Dataset[WindowTop] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => (e.ts.getTime / 1000 / windowSeconds) * windowSeconds)
      .flatMapGroupsWithState[MgState, WindowTop](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (winStart: Long, rows: Iterator[ItemEvent], state: GroupState[MgState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            s.items.zip(s.counts).toSeq
              .sortBy { case (item, c) => (-c, item) }
              .take(k).zipWithIndex.map { case ((item, c), i) =>
                WindowTop(new Timestamp(winStart * 1000), i + 1, item, c)
              }.iterator
          } else {
            // fold the micro-batch into the bounded Misra–Gries summary
            // (the shared sketch step — same semantics as the batch
            // operator by construction)
            val prev = state.getOption.getOrElse(MgState(Array.empty, Array.empty, 0L))
            val m = scala.collection.mutable.HashMap.from(
              prev.items.zip(prev.counts))
            var n = prev.n
            rows.foreach { e =>
              n += 1
              graft.operators.HeavyHitters.mgStep(m, e.item, capacity)
            }
            val ks = m.keys.toArray
            state.update(MgState(ks, ks.map(m), n))
            // close once the watermark passes the window end (clamp for
            // fully-late windows, same pattern as sessionize)
            state.setTimeoutTimestamp(math.max(
              (winStart + windowSeconds) * 1000,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}

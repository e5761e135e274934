package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over an event stream with columns
  * (event_id long, ts timestamp, user_id long, event_type string,
  * value double) — the incremental forms of the batch plans in
  * queries.EventQueries.
  *
  * Watermarking bounds state: at 100 TB/day the tumbling-window state is
  * |types| × |open windows| rows and sessions are per-active-user — both
  * evicted once the watermark passes, so state size is workload-bounded
  * rather than data-bounded.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type with a watermark. */
  def tumblingCounts(events: DataFrame, window: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Hopping (sliding) window counts/sums — the incremental form of the
    * batch `e_hopping_window` query: each event enters its
    * window/slide overlapping windows map-side, partial aggregation
    * combines per (window, type) before the state store, and the
    * watermark evicts a window's state once its end passes the
    * horizon — so open state is (window/slide) × |types| × horizon,
    * workload-bounded.
    */
  def hoppingCounts(events: DataFrame, window: String = "1 hour",
                    slide: String = "15 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming exact dedup: drops events whose `idCol` was already seen
    * within the watermark horizon — state is bounded by the horizon, so
    * at 100 TB/day the dedup store holds one key per unique id per
    * window, not per all-time.
    */
  def dedupStream(events: DataFrame, idCol: String,
                  watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Stream-stream interval join: every left row joined to the right
    * rows of the same key whose event time falls within the preceding
    * `lookbackSeconds` (inclusive on both ends) — the streaming form of
    * operators.RangeJoin. Both sides carry watermarks, so Spark bounds
    * the join state: right rows are dropped once the watermark passes
    * their eligibility window — state is interval-sized per key, not
    * unbounded. Select result columns with "l." / "r." qualifiers.
    */
  def streamIntervalJoin(left: DataFrame, right: DataFrame,
                         keyCol: String, tsCol: String,
                         lookbackSeconds: Long,
                         leftWatermark: String = "1 hour",
                         rightWatermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark(tsCol, leftWatermark).alias("l")
    val r = right.withWatermark(tsCol, rightWatermark).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$tsCol") >= col(s"l.$tsCol") -
          expr(s"INTERVAL $lookbackSeconds SECONDS") &&
        col(s"r.$tsCol") <= col(s"l.$tsCol"))
  }

  /** Stream-static enrichment: join a stream against a dimension
    * DataFrame. The static side is broadcast per micro-batch — no
    * stream state at all, and dimension updates are picked up on the
    * next batch (the standard slowly-changing-dimension pattern).
    */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Int)

  /** Gap-based sessionization via flatMapGroupsWithState with an
    * EVENT-time timeout: a session closes when the watermark passes
    * `last event + gapSeconds`, so replay and backfill — where
    * wall-clock bears no relation to event time — close sessions
    * identically to a live run. Custom state is the Spark-native
    * replacement for a hand-rolled session engine.
    */
  def sessionize(events: Dataset[Ev], gapSeconds: Long = 1800,
                 watermarkDelay: String = "30 minutes")
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.start * 1000),
              new Timestamp(s.last * 1000), s.n))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val sec = e.ts.getTime / 1000
              cur match {
                case Some(s) if sec - s.last <= gapSeconds =>
                  cur = Some(s.copy(last = sec, n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(userId, new Timestamp(s.start * 1000),
                    new Timestamp(s.last * 1000), s.n)
                  cur = Some(SessionState(sec, sec, 1))
                case None =>
                  cur = Some(SessionState(sec, sec, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close at last-event-time + gap, in event time; Spark
              // requires the target to be beyond the current watermark,
              // so a fully-late session clamps to watermark + 1ms and
              // closes on the next watermark advance
              state.setTimeoutTimestamp(math.max(
                s.last * 1000 + gapSeconds * 1000,
                state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  final case class EmaState(emaE6: Long, lastTs: Long, lastId: Long, n: Long)
  final case class EmaOut(user_id: Long, n_events: Long, ema_e6: Long,
                          ema: Double)

  /** Streaming per-user EMA — the incremental form of batch `e_ema`,
    * same 1e-6 fixed-point fold ((3·x + 7·acc) div 10), so with
    * in-order delivery (disorder only *within* a micro-batch, which is
    * re-sorted by event time) the streamed state is bit-identical to
    * the batch query over the same events. Events at or before the
    * last folded (ts, event_id) are dropped, never re-folded — an EMA
    * is order-sensitive, so silently folding stragglers out of order
    * would diverge from batch; dropping keeps the prefix invariant.
    *
    * State per user is one 4-field record (no history), emitted in
    * Update mode on every batch that touches the user.
    */
  def emaStream(events: Dataset[Ev]): Dataset[EmaOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[EmaState, EmaOut](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[EmaState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var cur = state.getOption.getOrElse(EmaState(0L, Long.MinValue,
            Long.MinValue, 0L))
          sorted.foreach { e =>
            val inOrder = e.ts.getTime > cur.lastTs ||
              (e.ts.getTime == cur.lastTs && e.event_id > cur.lastId)
            if (inOrder) {
              val v6 = math.round(e.value * 1000000.0)
              val ema = if (cur.n == 0L) v6
                        else (3L * v6 + 7L * cur.emaE6) / 10L
              cur = EmaState(ema, e.ts.getTime, e.event_id, cur.n + 1L)
            }
          }
          state.update(cur)
          EmaOut(userId, cur.n, cur.emaE6, cur.emaE6.toDouble / 1000000.0)
      }
  }

  final case class TouchState(touchTs: Long, touchType: String,
                              lastTs: Long, lastSide: Int, lastId: Long)
  final case class AttributionOut(event_id: Long, user_id: Long,
                                  ts: Timestamp, value: Double,
                                  touch: String)

  /** Streaming last-touch attribution — the incremental form of batch
    * `e_attribution`, and the streaming as-of join Spark has no native
    * operator for: per-user state caches the latest view/click (one
    * 4-field record — no history), and each purchase is credited on
    * arrival from that cache, `'none'` when the cache is empty or
    * older than `lookbackSeconds`.
    *
    * Same in-order contract as [[emaStream]]: rows are re-sorted by
    * (ts, event_id) within a micro-batch, and rows at or before the
    * last folded position are dropped, never re-folded — an as-of
    * match is order-sensitive, and append-mode emissions are final.
    */
  def attributionStream(events: Dataset[Ev],
                        lookbackSeconds: Long = 7L * 24 * 3600)
      : Dataset[AttributionOut] = {
    import events.sparkSession.implicits._
    // microsecond-exact timestamps (getTime is millis; the batch
    // tolerance compares unix_micros) so boundary staleness agrees
    // with the batch as-of join
    def micros(t: Timestamp): Long =
      t.getTime / 1000L * 1000000L + t.getNanos / 1000L
    events
      .filter(e => e.event_type == "purchase" ||
        e.event_type == "view" || e.event_type == "click")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, AttributionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[TouchState]) =>
          // sort mirrors the batch as-of tie rule: at one instant the
          // touch (side 0) folds BEFORE the purchase (side 1), so a
          // same-timestamp touch is visible to that purchase
          def side(e: Ev): Int = if (e.event_type == "purchase") 1 else 0
          val sorted = rows.toSeq
            .sortBy(e => (micros(e.ts), side(e), e.event_id))
          var cur = state.getOption.getOrElse(
            TouchState(Long.MinValue, "", Long.MinValue, Int.MinValue,
              Long.MinValue))
          val out = Seq.newBuilder[AttributionOut]
          sorted.foreach { e =>
            val ord = (micros(e.ts), side(e), e.event_id)
            val inOrder =
              Ordering[(Long, Int, Long)].gt(ord,
                (cur.lastTs, cur.lastSide, cur.lastId))
            if (inOrder) {
              if (e.event_type == "purchase") {
                val credited = cur.touchTs != Long.MinValue &&
                  cur.touchTs >= micros(e.ts) - lookbackSeconds * 1000000L
                out += AttributionOut(e.event_id, userId, e.ts, e.value,
                  if (credited) cur.touchType else "none")
                cur = cur.copy(lastTs = micros(e.ts), lastSide = 1,
                  lastId = e.event_id)
              } else {
                cur = TouchState(micros(e.ts), e.event_type,
                  micros(e.ts), 0, e.event_id)
              }
            }
          }
          state.update(cur)
          out.result().iterator
      }
  }

  // sxy/sxx travel as exact decimal STRINGS, not BigDecimal: Spark's
  // state encoder maps BigDecimal to Decimal(38,18) — only ~20 integer
  // digits — and a long-lived key whose exact sums crossed ~1e20 would
  // silently null at serialization. The string round-trip is bounded by
  // scala.math.BigDecimal's default MathContext.DECIMAL128 (34
  // significant digits — BigDecimal(s) rounds on parse past that), but
  // the in-flight scala BigDecimal arithmetic carries the same 34-digit
  // context, so persistence is never the weakest link: the stored
  // string is exactly the value the arithmetic held.
  final case class TrendState(x0: Long, n: Long, sx: Long, sy: Long,
                              sxy: String, sxx: String,
                              seen: Seq[Long])
  final case class TrendOut(event_type: String, n: Long,
                            slope: Option[Double],
                            intercept: Option[Double])

  /** Streaming per-type OLS trend — the incremental form of
    * `TimeSeries.linearTrend` over hourly counts. State per type is
    * the five regression sums plus the observed hours within the
    * lateness horizon (`latenessHours` entries at most — events older
    * than `max seen hour − latenessHours` are dropped, the same
    * bounded-disorder contract a watermark would impose); each event
    * updates the sums in O(1) exact arithmetic (Σxy/Σx² in BigDecimal
    * in flight, persisted as exact decimal strings — see TrendState),
    * and an
    * out-of-order hour BELOW the current origin rebases the sums
    * algebraically instead of reprocessing (shift x by δ: Σx += n·δ,
    * Σx² += 2δ·Σx + n·δ², Σxy += δ·Σy). Because every update is
    * exact, the emitted fit is bit-equal to the batch operator over
    * the same events regardless of batch boundaries or arrival order
    * — the spec asserts this including a rebasing batch. A single-bin
    * type has no slope yet: None, not NaN (as in batch).
    */
  def trendStream(events: Dataset[Ev],
                  latenessHours: Int = 8760): Dataset[TrendOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[TrendState, TrendOut](GroupStateTimeout.NoTimeout) {
        (etype: String, rows: Iterator[Ev], state: GroupState[TrendState]) =>
          var st = state.getOption.getOrElse(
            TrendState(Long.MaxValue, 0L, 0L, 0L, "0", "0", Nil))
          var seen = st.seen.toSet
          var maxh = if (seen.isEmpty) Long.MinValue else seen.max
          var (x0, n, sx, sy) = (st.x0, st.n, st.sx, st.sy)
          var sxy = BigDecimal(st.sxy)
          var sxx = BigDecimal(st.sxx)
          rows.foreach { e =>
            val h = e.ts.getTime / 3600000L
            // beyond the lateness horizon ⇒ its `seen` entry may be
            // evicted; folding it again would double-count — drop
            if (maxh == Long.MinValue || h >= maxh - latenessHours) {
              maxh = math.max(maxh, h)
              if (h < x0) {
                if (n > 0L) {
                  val d = BigDecimal(x0 - h)
                  sxx += d * 2 * BigDecimal(sx) + BigDecimal(n) * d * d
                  sx += n * (x0 - h)
                  sxy += d * BigDecimal(sy)
                }
                x0 = h
              }
              val x = h - x0
              if (!seen(h)) {
                seen += h; n += 1L; sx += x
                sxx += BigDecimal(x) * BigDecimal(x)
              }
              sy += 1L; sxy += BigDecimal(x)
            }
          }
          val kept = seen.filter(_ >= maxh - latenessHours)
          state.update(TrendState(x0, n, sx, sy, sxy.toString, sxx.toString,
            kept.toSeq))
          val den = n.toDouble * sxx.toDouble - sx.toDouble * sx
          val slope =
            if (den == 0.0) None
            else Some((n.toDouble * sxy.toDouble - sx.toDouble * sy) / den)
          TrendOut(etype, n, slope,
            slope.map(s => (sy.toDouble - s * sx) / n))
      }
  }

  final case class HourCount(hour: Long, n: Long)
  final case class TsAnomState(hours: Seq[HourCount], emittedUpTo: Long)
  final case class TsAnomOut(event_type: String, hour_start: Timestamp,
                             n: Long, z: Double, is_anomaly: Boolean)

  /** Streaming trailing-window anomaly detection — the incremental form
    * of `operators.TimeSeries.trailingZ` over per-type hourly counts.
    * An hour closes when the EVENT-time watermark passes its end; it is
    * then scored against the `lookback` observed hours immediately
    * before it with the identical integer-sum variance arithmetic, so
    * the emitted z is bit-equal to the batch operator over the same
    * events (the spec asserts this).
    *
    * State per event type is at most `lookback` closed hours (kept as
    * predecessors) plus the open tail — a few dozen 16-byte records
    * regardless of event volume; hours are pruned as soon as they can
    * no longer serve as a predecessor. Late rows for an already-closed
    * hour are dropped by the watermark BEFORE reaching the state
    * function (append-mode emissions are final, so the alternative —
    * re-folding — would double-emit).
    */
  def anomalyStream(events: Dataset[Ev], lookback: Int = 24,
                    zCut: Double = 3.0,
                    watermarkDelay: String = "2 hours")
      : Dataset[TsAnomOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[TsAnomState, TsAnomOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (etype: String, rows: Iterator[Ev], state: GroupState[TsAnomState]) =>
          val prev = state.getOption.getOrElse(TsAnomState(Nil, Long.MinValue))
          // fold this batch's rows into per-hour counts (hours in
          // epoch-seconds; emitted hours never recur — watermark-dropped)
          val newCounts = rows.foldLeft(Map.empty[Long, Long]) { (m, e) =>
            val h = e.ts.getTime / 3600000L * 3600L
            m.updated(h, m.getOrElse(h, 0L) + 1L)
          }
          val base = prev.hours.map(hc => hc.hour -> hc.n).toMap
          val merged = newCounts.foldLeft(base) { case (m, (h, n)) =>
              m.updated(h, m.getOrElse(h, 0L) + n)
            }.toSeq.sortBy(_._1).map { case (h, n) => HourCount(h, n) }
          val wmSec = state.getCurrentWatermarkMs() / 1000L
          val out = Seq.newBuilder[TsAnomOut]
          var emittedUpTo = prev.emittedUpTo
          merged.zipWithIndex.foreach { case (hc, i) =>
            if (hc.hour > emittedUpTo && hc.hour + 3600L <= wmSec) {
              if (i >= lookback) {
                val preds = merged.slice(i - lookback, i)
                val s = preds.map(_.n).sum
                // BigInt squares: mirrors the batch operator's DECIMAL
                // n² (no long wrap); BigInt→double and decimal→double
                // both round to nearest, so bit-equality holds
                val ss = preds.map(p => BigInt(p.n) * BigInt(p.n)).sum
                val c = lookback.toLong
                val mean = s.toDouble / c
                val variance =
                  (ss.toDouble - s.toDouble * s / c) / (c - 1)
                if (variance > 0) {
                  val z = (hc.n.toDouble - mean) / math.sqrt(variance)
                  out += TsAnomOut(etype, new Timestamp(hc.hour * 1000L),
                    hc.n, z, math.abs(z) > zCut)
                }
              }
              emittedUpTo = hc.hour
            }
          }
          // prune: keep the `lookback` hours before the first open hour
          // (future predecessors) plus the open tail itself
          val firstOpen = merged.indexWhere(_.hour > emittedUpTo) match {
            case -1 => merged.length
            case i  => i
          }
          val kept = merged.drop(math.max(0, firstOpen - lookback))
          state.update(TsAnomState(kept, emittedUpTo))
          // wake when the earliest open hour can close (event time)
          kept.find(_.hour > emittedUpTo).foreach { hc =>
            state.setTimeoutTimestamp(math.max(
              hc.hour * 1000L + 3600000L,
              state.getCurrentWatermarkMs() + 1))
          }
          out.result().iterator
      }
  }

  final case class FunnelState(sUs: Long, cUs: Long, pUs: Long,
                               emitted: Int)
  final case class FunnelOut(user_id: Long, stage: Int)

  /** Streaming twin of the batch funnel
    * ([[graft.operators.Funnel.stages]]): per-user state machine over
    * (signup → click → purchase) with the same greedy
    * first-qualifying-event rule — each step must land strictly after
    * the previous step's recorded event and within the horizon of it.
    * With per-user in-order delivery (disorder *within* a micro-batch
    * is re-sorted by (ts, event_id); the same cross-batch prefix
    * contract as [[emaStream]]), the first qualifying event the
    * machine sees IS the batch min, so final per-user stages are
    * bit-equal to the batch operator — StreamingSpec pins it.
    *
    * State per user is three timestamps + the last emitted stage (one
    * small fixed record, no history); Update mode emits (user, stage)
    * only when the stage advances, so output volume is at most
    * 3 rows/user over the stream's lifetime. Comparisons run in
    * MICROSECONDS (Spark's timestamp precision) — millis would merge
    * distinct event times and diverge from batch.
    */
  def funnelStream(events: Dataset[Ev],
                   horizonSeconds: Long = 86400): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val horizonUs = horizonSeconds * 1000000L
    def micros(ts: Timestamp): Long =
      math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[FunnelState]) =>
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L, 0))
          sorted.foreach { e =>
            val us = micros(e.ts)
            e.event_type match {
              case "signup" if st.sUs < 0 =>
                st = st.copy(sUs = us)
              case "click" if st.sUs >= 0 && st.cUs < 0 &&
                  us > st.sUs && us <= st.sUs + horizonUs =>
                st = st.copy(cUs = us)
              case "purchase" if st.cUs >= 0 && st.pUs < 0 &&
                  us > st.cUs && us <= st.cUs + horizonUs =>
                st = st.copy(pUs = us)
              case _ => ()
            }
          }
          val stage =
            if (st.pUs >= 0) 3 else if (st.cUs >= 0) 2
            else if (st.sUs >= 0) 1 else 0
          if (stage > st.emitted) {
            state.update(st.copy(emitted = stage))
            Iterator(FunnelOut(userId, stage))
          } else {
            if (st != state.getOption.getOrElse(
                FunnelState(-1L, -1L, -1L, 0))) state.update(st)
            Iterator.empty
          }
      }
  }

  /** Streaming twin of the batch `e_mad_outliers` screen: the robust
    * per-type statistics (median, MAD) are fitted OFFLINE on a batch
    * corpus (small model — |event_types| rows — to the driver, the
    * same contract as [[DedupStream.clusterScreen]]'s centroids) and
    * baked into the plan as literals; the stream side is then a
    * STATELESS map-side filter + projection — no state store, no
    * shuffle, identical arithmetic to the batch query so the emitted
    * rows are bit-equal on the same inputs.
    */
  def madScreen(stream: DataFrame,
                stats: Map[String, (Double, Double)]): DataFrame = {
    require(stats.nonEmpty, "madScreen: empty stats model")
    val medExpr = stats.toSeq.sortBy(_._1)
      .foldLeft(lit(Double.NaN)) { case (acc, (ty, (med, _))) =>
        when(col("event_type") === ty, lit(med)).otherwise(acc)
      }
    val madExpr = stats.toSeq.sortBy(_._1)
      .foldLeft(lit(Double.NaN)) { case (acc, (ty, (_, mad))) =>
        when(col("event_type") === ty, lit(mad)).otherwise(acc)
      }
    stream
      .withColumn("__med", medExpr).withColumn("__mad", madExpr)
      // NaN (unseen type) fails both comparisons -> row dropped, same
      // as the batch join dropping a type absent from the stats side
      .filter(col("__mad") > 0.0 &&
        abs(col("value") - col("__med")) > lit(3.0) * lit(1.4826) * col("__mad"))
      .select(col("event_id"), col("event_type"), col("value"),
        ((col("value") - col("__med")) / (lit(1.4826) * col("__mad")))
          .as("robust_z"))
  }
  final case class MkState(ts: Long, eid: Long, et: String)
  final case class MkPair(user_id: Long, prev: String, next: String)

  /** Streaming half of the Markov transition model
    * (`e_markov_transitions`): one state record per user holding the
    * LAST event, emitting a (prev, next) pair per arrival — the
    * pair-extraction lag window turned into an O(1)-state keyed fold.
    * Downstream counting happens in [[markovRollup]] over the emitted
    * pair ledger (one stateful operator per query — the chained-
    * stateful restriction). Given in-event-time-order delivery per
    * user, the pair stream is exactly the batch lag()'s pair set. */
  def transitionPairStream(events: Dataset[Ev]): Dataset[MkPair] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[MkState, MkPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (u: Long, rows: Iterator[Ev], state: GroupState[MkState]) =>
          var cur = state.getOption
          val out = rows.toSeq
            .sortBy(e => (e.ts.getTime, e.event_id)).flatMap { e =>
              val p = cur.map(s => MkPair(u, s.et, e.event_type))
              cur = Some(MkState(e.ts.getTime, e.event_id, e.event_type))
              p
            }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** Snapshot rollup: transition probabilities from the pair ledger —
    * the identical exact-integer algebra as the batch
    * `e_markov_transitions`, so a monitor fed the batch's events
    * reproduces its rows bit-for-bit (StreamingSpec proof
    * obligation). */
  def markovRollup(pairs: DataFrame): DataFrame = {
    val pc = pairs.groupBy("prev", "next").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val mg = pc.groupBy("prev").agg(sum("n").as("tot"))
    pc.join(broadcast(mg), "prev")
      .select(col("prev"), col("next"), col("n"),
        expr("n * 1000000 div tot").as("p_ppm"))
  }
}

package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Dataset

/** Holt-Winters additive seasonal (triple exponential) smoothing —
  * the forecaster for series with BOTH drift and a repeating daily
  * shape, the step past [[Holt]] when the hourly ingest volume has a
  * diurnal cycle (every crawl does). Tracks level, trend, and one
  * seasonal term per hour-of-cycle:
  *
  *   f_t = l_{t−1} + b_{t−1} + s_{t−m}
  *   l_t = α·(x_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  *   s_t = γ·(x_t − l_t) + (1−γ)·s_{t−m}
  *
  * Engine shape (same contract as [[Holt]]): the corpus-sized work is
  * the ONE hourly aggregation upstream; each per-key series (hundreds
  * of rows, bounded by the calendar window) folds sequentially inside
  * `flatMapGroups` with an m-slot seasonal ring buffer — state is
  * (l, b, m doubles), constant per key.
  *
  * Determinism: raw IEEE doubles through exact literal expressions (no
  * libm, no reassociation; 1−α spelled as the literal 0.8, never
  * computed), so a DuckDB recursive CTE carrying the seasonal vector
  * as a LIST column replays every iterate bit-for-bit; outputs round
  * once at the edge. Classical init: l = mean of season 1, b =
  * (sum₂ − sum₁)/m², s_i = x_i − l; keys with fewer than 2m
  * observations emit nothing (no seasonal factors are estimable).
  * Missing buckets (hours with zero events) are treated as absent
  * observations, not zeros — the fold consumes the ORDERED series it
  * is given (gap-fill upstream with `e_gap_fill`'s spine if zeros are
  * the intended semantics).
  */
object HoltWinters {

  val Alpha = 0.2
  val OneMinusAlpha = 0.8
  val Beta = 0.1
  val OneMinusBeta = 0.9
  val Gamma = 0.3
  val OneMinusGamma = 0.7

  /** Hour-of-day cycle. */
  val Period = 24

  final case class In(et: String, h: Timestamp, x: Long)
  final case class Out(event_type: String, h: Timestamp, x: Long,
                       level: Double, trend: Double, seasonal: Double,
                       fcst: Double)

  /** Batch fold: one output row per observation past the first season
    * (t > m); input must be one row per (et, h). */
  def fit(hourly: Dataset[In], m: Int = Period): Dataset[Out] = {
    import hourly.sparkSession.implicits._
    require(m >= 2, s"period must be >= 2, got $m")
    hourly.groupByKey(_.et).flatMapGroups { (et, it) =>
      val rows = it.toArray.sortBy(_.h.getTime)
      if (rows.length < 2 * m) Iterator.empty
      else {
        val s1 = rows.take(m).map(_.x).sum
        val s2 = rows.slice(m, 2 * m).map(_.x).sum
        var l = s1.toDouble / m.toDouble
        var b = (s2.toDouble - s1.toDouble) / (m.toDouble * m.toDouble)
        val ss = Array.tabulate(m)(i => rows(i).x.toDouble - l)
        val out = Array.newBuilder[Out]
        var t = m
        while (t < rows.length) {
          val x = rows(t).x
          val sOld = ss(t % m) // s_{t−m} lives at the same ring slot
          val f = l + b + sOld
          val lNew = Alpha * (x.toDouble - sOld) + OneMinusAlpha * (l + b)
          val bNew = Beta * (lNew - l) + OneMinusBeta * b
          val sNew = Gamma * (x.toDouble - lNew) + OneMinusGamma * sOld
          ss(t % m) = sNew
          l = lNew; b = bNew
          out += Out(et, rows(t).h, x, l, b, sNew, f)
          t += 1
        }
        out.result().iterator
      }
    }
  }
}

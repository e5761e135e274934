package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Hll

/** Streaming sketch maintenance: the cardinality monitor a 100 TB
  * ingest pipeline runs CONTINUOUSLY instead of nightly.
  *
  * HLL registers are the ideal streaming state: bounded (≤ 1024 rows
  * per group, each a byte-sized max), merged by an idempotent,
  * commutative, associative per-register MAX — so a plain streaming
  * aggregation in Complete mode IS the sketch, with no custom state
  * function, no watermark subtleties (MAX never needs retraction), and
  * replay/at-least-once delivery changing nothing (max is idempotent).
  *
  * Equivalence contract: after any prefix of the stream, the register
  * table EQUALS [[Hll.registers]] over the rows ingested so far —
  * the per-row (g, reg, rho) projection is literally the same
  * [[Hll.rhoRows]] call, and streaming MAX == batch MAX on the same
  * rows. StreamingSpec proves it end-to-end through a MemoryStream,
  * estimates included via [[Hll.estimate]] on the snapshot.
  */
object SketchStream {

  /** Streaming HLL register maintenance: groupBy (g, reg) MAX(rho)
    * over the arriving rows. Run with outputMode=complete into a
    * memory/snapshot sink; fold a snapshot to estimates with
    * [[Hll.estimate]].
    */
  def hllRegisters(stream: DataFrame, groupCol: Column,
                   valueCol: Column): DataFrame =
    // the batch operator verbatim — the same groupBy-MAX plans as a
    // streaming aggregation on a streaming input, and ONE definition
    // means the equivalence contract cannot drift
    Hll.registers(stream, groupCol, valueCol)

  /** Streaming count-min maintenance: the same per-row cell explosion
    * as batch [[graft.operators.Cms.cells]], counted as a streaming
    * aggregation — bounded state (≤ depth·width cells), merged by SUM.
    * Point-probe a snapshot with [[graft.operators.Cms.probe]].
    * NOTE the delivery contract differs from HLL: SUM is NOT
    * idempotent, so this twin requires exactly-once sources (which
    * Structured Streaming's replay + state checkpointing provides);
    * at-least-once re-sends would double-count.
    */
  def cmsCounters(stream: DataFrame, keyCol: Column, depth: Int,
                  width: Int): DataFrame =
    // batch operator verbatim, as above — single definition, no drift
    graft.operators.Cms.counters(stream, keyCol, depth, width)
}

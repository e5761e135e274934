package graft.operators

import java.util.concurrent.atomic.{AtomicLong, AtomicInteger}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Runtime query metrics — the "measure, don't guess" counterpart to
  * the plan-string guards in PlanSpec: registers a SparkListener for
  * the duration of one action and aggregates its stages' shuffle and
  * task counters. Plan strings prove intent ("no Exchange"); these
  * counters prove behavior (zero bytes actually crossed the wire), and
  * at cluster scale the same numbers are what you watch to catch a
  * plan regression in production.
  *
  * Listener events are delivered asynchronously on the bus, so
  * [[measure]] waits for the bus to drain before reading the counters.
  * Counters are aggregated with atomics — stages from concurrent jobs
  * of OTHER queries on the same session would be folded in too, so
  * measure one action at a time (the intended harness use).
  */
object Metrics {

  final case class QueryMetrics(shuffleReadBytes: Long,
                                shuffleWriteBytes: Long,
                                shuffleRecordsWritten: Long,
                                inputBytesRead: Long,
                                inputRecordsRead: Long,
                                stages: Int,
                                tasks: Int)

  /** Run `body` (one Spark action) and return its result plus the
    * aggregated stage metrics it produced.
    */
  def measure[T](spark: SparkSession)(body: => T): (T, QueryMetrics) = {
    val shuffleRead = new AtomicLong(0L)
    val shuffleWrite = new AtomicLong(0L)
    val shuffleRecords = new AtomicLong(0L)
    val inputBytes = new AtomicLong(0L)
    val inputRecords = new AtomicLong(0L)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val m = ev.stageInfo.taskMetrics
        if (m != null) {
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          inputBytes.addAndGet(m.inputMetrics.bytesRead)
          inputRecords.addAndGet(m.inputMetrics.recordsRead)
        }
        stages.incrementAndGet()
        tasks.addAndGet(ev.stageInfo.numTasks)
      }
    }
    // drain events still queued from PRIOR actions before registering —
    // the async bus delivers queued events to listeners present at
    // dispatch time, so without this a previous query's stages would be
    // folded into the new measurement
    org.apache.spark.sql.graft.Bridge.drainListenerBus(
      spark.sparkContext, 60000L)
    spark.sparkContext.addSparkListener(listener)
    try {
      val result = body
      // listener bus is async: flush queued events before reading
      org.apache.spark.sql.graft.Bridge.drainListenerBus(
        spark.sparkContext, 60000L)
      (result, QueryMetrics(shuffleRead.get(), shuffleWrite.get(),
        shuffleRecords.get(), inputBytes.get(), inputRecords.get(),
        stages.get(), tasks.get()))
    } finally {
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}

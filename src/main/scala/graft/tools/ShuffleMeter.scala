package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Shared shuffle-write meter for the measurement probes: sums
  * `shuffleWriteMetrics.bytesWritten` over completed stages. Reads and
  * resets DRAIN the async listener bus first (via the GraftBridge
  * accessor) — a sleep-based drain races the bus under load, letting a
  * prior run's late stage events leak into the next measurement.
  */
final class ShuffleMeter(spark: SparkSession) {
  private val bytes = new AtomicLong(0L)
  spark.sparkContext.addSparkListener(new SparkListener {
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      bytes.addAndGet(
        sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  })

  /** Drain pending events from earlier work, then zero the counter. */
  def reset(): Unit = {
    org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
    bytes.set(0L)
  }

  /** Drain pending events, then read the accumulated megabytes. */
  def mb(): Double = {
    org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
    bytes.get / 1048576.0
  }
}

package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Listener-based shuffle measurement for specs that pin an operator's
  * actual lever — shuffle VOLUME — which local wall-clock cannot (a
  * local[N] shuffle is memory-speed).
  */
object TestMetrics {

  /** (records, bytes) written to shuffle while `f` runs. Listener events
    * drain asynchronously; settles on a stable count.
    */
  def shuffleWritten(spark: SparkSession)(f: => Unit): (Long, Long) = {
    val records = new AtomicLong
    val bytes = new AtomicLong
    val l = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          records.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
          bytes.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      // Deterministic drain: two equal 100ms-apart reads can still
      // undercount if the bus is mid-flush — wait until the listener bus
      // is actually empty instead of polling for a stable sum.
      org.apache.spark.graftbridge.ListenerBridge.waitUntilEmpty(
        spark.sparkContext, 30000L)
      (records.get, bytes.get)
    } finally spark.sparkContext.removeSparkListener(l)
  }
}

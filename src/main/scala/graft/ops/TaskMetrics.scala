package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.LongAdder

/** Execution observability: aggregate task metrics (shuffle bytes, spill,
  * records) over a block of work. This is how the engine answers "did
  * that join shuffle, and how much?" with numbers instead of plan
  * strings — the runtime complement to PlanAuditSpec's static checks.
  *
  * Uses the public SparkListener API, so it works unchanged on a real
  * cluster (metrics aggregate across executors exactly the same way).
  */
object TaskMetrics {

  final case class Totals(shuffleWriteBytes: Long, shuffleReadBytes: Long,
                          spillBytes: Long, inputRecords: Long,
                          outputRecords: Long)

  /** Run `body`, returning (result, aggregated task metrics for all jobs
    * executed inside it). */
  def measure[A](spark: SparkSession)(body: => A): (A, Totals) = {
    val sw = new LongAdder; val sr = new LongAdder; val sp = new LongAdder
    val ir = new LongAdder; val or = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          sw.add(m.shuffleWriteMetrics.bytesWritten)
          sr.add(m.shuffleReadMetrics.totalBytesRead)
          sp.add(m.diskBytesSpilled)
          ir.add(m.inputMetrics.recordsRead)
          or.add(m.outputMetrics.recordsWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = body
      // listener events are posted asynchronously (and the bus API is
      // private); wait until the counters stabilize, bounded
      def snapshot() = sw.sum + sr.sum + sp.sum + ir.sum + or.sum
      var prev = -1L
      var tries = 0
      while (snapshot() != prev && tries < 50) {
        prev = snapshot(); Thread.sleep(100); tries += 1
      }
      (r, Totals(sw.sum, sr.sum, sp.sum, ir.sum, or.sum))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}

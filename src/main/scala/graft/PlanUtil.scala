package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation for ITERATIVE loops.
  *
  * `localCheckpoint()` truncates the physical lineage, but Spark rewrites
  * the checkpointed `LogicalRDD`'s STATISTICS from the original plan
  * (`LogicalRDD.rewriteStatsAndConstraints`) — so the estimated
  * sizeInBytes compounds across rounds. A loop whose next round joins the
  * checkpoint against itself (k-core's two endpoint restrictions,
  * hash-to-min's min-table + rewrite join) therefore DOUBLES the
  * sizeInBytes bit-length every round — join estimates multiply — and
  * `BigInteger would overflow supported range` kills the loop at ~31
  * rounds, exactly on the deep graphs the convergence guards exist for
  * (caught by GraphConvergenceSpec's 40-deep peel).
  *
  * Rebuilding the frame from the checkpointed RDD resets the statistics
  * to the session default as well: per-round stats stay constant in round
  * count, at the cost of one Row↔InternalRow conversion on each read of
  * the checkpoint — negligible for the narrow (id, value) frames these
  * loops carry, and the conservative default size keeps the per-round
  * joins on the shuffle path, which is what an iteration over a
  * 100 TB-derived edge list wants anyway.
  */
object PlanUtil {

  /** Cumulative wall time spent inside [[checkpointTruncated]] (and call
    * count), JVM-wide. The bench detail snapshots this around each query
    * so a checkpoint-cost creep in the iterative family shows up as its
    * own counter instead of hiding inside warm totals (VERDICT r7 #8).
    * Monotonic accumulators — readers diff two snapshots. */
  private val cpNanos = new java.util.concurrent.atomic.AtomicLong(0L)
  private val cpCalls = new java.util.concurrent.atomic.AtomicLong(0L)

  /** (total seconds spent checkpointing, number of checkpoints) so far. */
  def checkpointStats: (Double, Long) =
    (cpNanos.get() / 1e9, cpCalls.get())

  /** Postfix timed variant for the call sites that need plain
    * `localCheckpoint()` semantics (no stats-resetting rebuild): the wall
    * time still lands in the [[checkpointStats]] accumulators the bench
    * detail reports. */
  implicit class TimedCheckpoint[T](
      private val ds: org.apache.spark.sql.Dataset[T]) extends AnyVal {
    def timedLocalCheckpoint(): org.apache.spark.sql.Dataset[T] = {
      val t0 = System.nanoTime()
      try ds.localCheckpoint()
      finally {
        cpNanos.addAndGet(System.nanoTime() - t0)
        cpCalls.incrementAndGet()
      }
    }
  }

  def checkpointTruncated(df: DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    try {
      val cp = df.localCheckpoint()
      cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
    } finally {
      cpNanos.addAndGet(System.nanoTime() - t0)
      cpCalls.incrementAndGet()
    }
  }
}

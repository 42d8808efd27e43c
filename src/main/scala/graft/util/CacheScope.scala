package graft.util

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for operator-internal persists (multi-consumer intermediates:
  * minhash signatures, shingle indexes, IVF centroids, tf tables). The
  * operators return LAZY DataFrames whose plans reference the persisted
  * intermediate, so they cannot unpersist before returning — and without a
  * release point, a long-lived session calling dedup/ANN repeatedly
  * accumulates cached blocks until eviction pressure (MEMORY_AND_DISK
  * degrades rather than OOMs, but the disk fills and every new cache write
  * competes with real work).
  *
  * The contract: operators persist through [[persist]]; the session owner
  * calls [[releaseAll]] once the results of a unit of work are
  * MATERIALIZED (written, collected, or counted). Verify releases after
  * each query's parquet dump; Bench releases after each query's timed
  * runs (not between repeat runs of one query — identical re-built plans
  * hit the CacheManager and reuse the warm blocks, which is the measured
  * steady-state a benchmark should report). Releasing early merely costs
  * a recompute; it can never change results.
  */
object CacheScope {

  private val live = new ConcurrentLinkedQueue[DataFrame]()
  private val liveCp = new ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` (MEMORY_AND_DISK — the only level operators here use)
    * and register it for the next [[releaseAll]]. Idempotent: a frame the
    * caller already persisted (a pre-cached tf table handed to a scoring
    * pass that defensively persists its input) is returned as-is instead
    * of being re-registered — re-persisting would log cache warnings and
    * triple-count the frame in [[liveCount]]/releaseAll.
    */
  def persist(df: DataFrame): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      live.add(df)
    }
    df
  }

  /** Unpersist every registered intermediate (non-blocking by default —
    * in-flight jobs recompute from lineage; pass `blocking = true` when a
    * caller needs `getPersistentRDDs` to reflect the release immediately,
    * e.g. a spec establishing a baseline).
    */
  def releaseAll(blocking: Boolean = false): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking)
      df = live.poll()
    }
    var cp = liveCp.poll()
    while (cp != null) {
      releaseCheckpoint(cp)
      cp = liveCp.poll()
    }
  }

  /** Eagerly `localCheckpoint` `df` and register the checkpoint blocks
    * for the next [[releaseAll]]. `Dataset.unpersist` cannot free
    * checkpoint blocks (they live under the `LogicalRDD` leaf, outside
    * the CacheManager), so operators that checkpoint per call — the
    * capstone pipelines' lineage cuts, every Lloyd/PageRank/LPA/BPE
    * final state — would otherwise pin their blocks for the SESSION's
    * lifetime: a 173-query driver run accumulates hundreds of dead
    * block sets, and the creeping executor-storage pressure shows up as
    * session-wide slowdown that no isolated rerun reproduces. Same
    * release point as [[persist]]: after the query's results are
    * materialized, when the blocks are provably dead.
    */
  def checkpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(true)
    liveCp.add(cp)
    cp
  }

  /** `.scopedCheckpoint()` chain syntax for [[checkpoint]] — so the
    * iterative loops keep their postfix-on-the-plan shape.
    */
  implicit class CheckpointOps(private val df: DataFrame) {
    def scopedCheckpoint(): DataFrame = CacheScope.checkpoint(df)
  }

  /** Unpersist ONE registered frame — for callers that share the session
    * with other in-flight work (a streaming foreachBatch releasing its own
    * batch-scoped persist must not blow away a concurrent query's frames
    * the way [[releaseAll]] would).
    */
  def release(df: DataFrame, blocking: Boolean = false): Unit = {
    live.remove(df)
    df.unpersist(blocking)
  }

  /** Registered-but-not-yet-released count — spec hook. */
  def liveCount: Int = live.size()

  /** Release the storage blocks behind an eager `localCheckpoint` frame.
    *
    * `Dataset.unpersist` only touches the CacheManager; a checkpointed
    * frame's data lives as persisted RDD blocks under its `LogicalRDD`
    * leaf, so iterative operators (PageRank, LPA, k-means, BPE, cluster
    * collapse) that checkpoint per round would otherwise hold EVERY
    * round's |V|-row blocks live until the context's reference-tracking
    * cleaner happens to GC them. Call on round N-1's frame once round N's
    * checkpoint has materialized — by then nothing references the old
    * blocks, so the release can never change results, only free storage.
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
}

package graft.etl

import org.apache.spark.sql.streaming.StreamingQuery

/** A3 — pipeline run statistics (pipeline.rs:15-54, 288-310): block attempt/
  * success/failure counts, derived rates, and the top-5 error list. Sourced
  * from Structured Streaming progress events instead of hand-threaded
  * counters — the engine-native place this telemetry already exists.
  */
final case class RunStats(
    blocksAttempted: Long,
    blocksSucceeded: Long,
    blocksFailed: Long,
    totalTransactions: Long,
    elapsedSecs: Double,
    errors: Seq[String]) {

  /** pipeline.rs:30-36 — percentage, 0 when nothing attempted. */
  def successRate: Double =
    if (blocksAttempted == 0) 0.0 else blocksSucceeded * 100.0 / blocksAttempted

  /** pipeline.rs:38-54 — rates, 0 for a zero-length run. */
  def blocksPerSecond: Double =
    if (elapsedSecs <= 0) 0.0 else blocksSucceeded / elapsedSecs
  def transactionsPerSecond: Double =
    if (elapsedSecs <= 0) 0.0 else totalTransactions / elapsedSecs

  /** pipeline.rs:303 — at most 5 errors shown. */
  def topErrors: Seq[String] = errors.take(5)

  def merge(other: RunStats): RunStats = RunStats(
    blocksAttempted + other.blocksAttempted,
    blocksSucceeded + other.blocksSucceeded,
    blocksFailed + other.blocksFailed,
    totalTransactions + other.totalTransactions,
    elapsedSecs + other.elapsedSecs,
    errors ++ other.errors)
}

object RunStats {
  val empty: RunStats = RunStats(0, 0, 0, 0, 0.0, Nil)

  /** Summarize a finished (or running) streaming query's progress: input
    * rows are slots (one row per block at the source), batch durations sum
    * to elapsed, and the query's exception — if any — is the error list.
    */
  def fromQuery(query: StreamingQuery): RunStats = {
    val progress = query.recentProgress.toSeq
    val attempted = progress.map(_.numInputRows).sum
    val elapsedMs = progress.flatMap(p => Option(p.durationMs.get("triggerExecution")))
      .map(_.longValue).sum
    val err = query.exception.map(_.getMessage).toSeq
    RunStats(
      blocksAttempted = attempted,
      blocksSucceeded = if (err.isEmpty) attempted else 0L,
      blocksFailed = if (err.isEmpty) 0L else attempted,
      totalTransactions = 0L, // filled by the caller from the landed table
      elapsedSecs = elapsedMs / 1000.0,
      errors = err)
  }
}

package graft.util

/** ST4 — bounded retry with linearly-scaled delay, the reference's retry
  * loop semantics (ref src/pipeline.rs:187-243: `max_retries = 3`, sleep
  * `retry_delay * retry_count` between attempts) as a reusable combinator.
  *
  * The delay schedule is deterministic (delay, 2*delay, ...) and the
  * sleeper is injectable so specs pin the schedule without wall-clock
  * waits. Only transient errors retry; anything else propagates at once.
  */
object Retry {

  /** IOExceptions (network, filesystem) are transient; everything else —
    * parse errors, logic bugs — fails fast, matching the reference's
    * retryable/non-retryable split (pipeline.rs:64,153).
    */
  def defaultTransient(e: Throwable): Boolean = e.isInstanceOf[java.io.IOException]

  def withBackoff[T](
      maxRetries: Int = 3,
      delayMs: Long = 2000L,
      isTransient: Throwable => Boolean = defaultTransient,
      sleeper: Long => Unit = Thread.sleep)(f: => T): T = {
    require(maxRetries >= 0, s"maxRetries must be >= 0, got $maxRetries")
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: Throwable if isTransient(e) =>
          attempt += 1
          if (attempt > maxRetries) throw e
          sleeper(delayMs * attempt)
      }
    }
    sys.error("unreachable")
  }
}

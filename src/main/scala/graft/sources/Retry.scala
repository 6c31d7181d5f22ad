package graft.sources

/** Retry/backoff semantics for the connection seams (SURVEY §3.3).
  *
  * Mirrors the reference's network-edge policy as a task-local utility:
  *  - a bounded attempt budget with exponential backoff between attempts
  *    (retry.rs:4-29: max retries, doubling delay);
  *  - a retryable/fatal split — 429/5xx-style transients retry, 400/403
  *    routing outcomes do not (api.rs:136-146 retries 429+504 only; the
  *    400 miss and 403 block are data, handled by P4/S4);
  *  - client rotation on retry — the attempt index reaches the body so a
  *    fresh client can replace a poisoned one (clients/http.rs:110-138
  *    rotates through a client pool on failure).
  *
  * This lives INSIDE a `mapPartitions` body (one budget per element, one
  * client per partition), never at the plan level: Spark's own
  * `spark.task.maxFailures` re-runs whole tasks on executor loss, which
  * would re-fetch every row of the partition; element-level retry is what
  * keeps a transient 429 from costing a task re-run. Jitter is derived
  * from (seed, attempt) — deterministic, so tests and re-runs see the
  * same schedule (same spirit as F13's keyed jitter).
  */
object Retry {

  /** A failure the policy may retry (the 429/504 analog). */
  final case class Transient(msg: String) extends RuntimeException(msg)

  /** Run `body(attempt)` with attempts 1..maxAttempts. Transient failures
    * back off `baseDelayMs * 2^(attempt-1) + jitter` then retry; any other
    * throwable — and a Transient on the final attempt — propagates.
    * `sleep` is injectable so specs can record the schedule instead of
    * sleeping. */
  def withRetry[T](maxAttempts: Int, baseDelayMs: Long, seed: Long = 0L,
                   sleep: Long => Unit = Thread.sleep)(body: Int => T): T = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1: $maxAttempts")
    var attempt = 1
    while (true) {
      try return body(attempt)
      catch {
        case e: Transient =>
          if (attempt >= maxAttempts) throw e
          sleep(backoffMs(baseDelayMs, attempt, seed))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Exponential delay with deterministic keyed jitter in [0, base). */
  def backoffMs(baseDelayMs: Long, attempt: Int, seed: Long): Long = {
    val exp = baseDelayMs << math.min(attempt - 1, 20)
    val jitter =
      if (baseDelayMs <= 0) 0L
      else math.floorMod(seed * 6364136223846793005L + attempt * 1442695040888963407L,
        baseDelayMs)
    exp + jitter
  }
}

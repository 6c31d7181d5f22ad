package graft

import graft.sources.Retry
import org.scalatest.funsuite.AnyFunSuite

/** Retry budget semantics (reference src/utils/retry.rs:4-29,
  * src/services/api.rs:136-146, clients/http.rs:110-138). */
class RetrySpec extends AnyFunSuite {

  test("transient failures retry up to the budget, then the last error propagates") {
    var calls = 0
    val e = intercept[Retry.Transient] {
      Retry.withRetry(maxAttempts = 3, baseDelayMs = 0, sleep = _ => ()) { _ =>
        calls += 1; throw Retry.Transient(s"attempt $calls")
      }
    }
    assert(calls === 3)
    assert(e.getMessage === "attempt 3")
  }

  test("success on a later attempt returns and stops retrying (client rotation visible)") {
    val attemptsSeen = collection.mutable.Buffer[Int]()
    val got = Retry.withRetry(maxAttempts = 5, baseDelayMs = 0, sleep = _ => ()) { attempt =>
      attemptsSeen += attempt
      if (attempt < 3) throw Retry.Transient("429") else s"client-$attempt"
    }
    assert(got === "client-3") // the body sees the attempt index -> can rotate clients
    assert(attemptsSeen.toList === List(1, 2, 3))
  }

  test("fatal errors do not retry") {
    var calls = 0
    intercept[IllegalStateException] {
      Retry.withRetry(maxAttempts = 5, baseDelayMs = 0, sleep = _ => ()) { _ =>
        calls += 1; throw new IllegalStateException("403: do not retry")
      }
    }
    assert(calls === 1)
  }

  test("backoff doubles per attempt with deterministic keyed jitter") {
    val slept = collection.mutable.Buffer[Long]()
    intercept[Retry.Transient] {
      Retry.withRetry(maxAttempts = 4, baseDelayMs = 100, seed = 42,
        sleep = slept += _) { _ => throw Retry.Transient("x") }
    }
    assert(slept.size === 3) // no sleep after the final attempt
    // exponential base: 100, 200, 400; jitter in [0, 100)
    val bases = Seq(100L, 200L, 400L)
    slept.zip(bases).foreach { case (s, b) =>
      assert(s >= b && s < b + 100, s"delay $s outside [$b, ${b + 100})")
    }
    // deterministic: same seed -> same schedule
    val again = collection.mutable.Buffer[Long]()
    intercept[Retry.Transient] {
      Retry.withRetry(maxAttempts = 4, baseDelayMs = 100, seed = 42,
        sleep = again += _) { _ => throw Retry.Transient("x") }
    }
    assert(again.toList === slept.toList)
  }
}

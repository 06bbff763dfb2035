package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Retry

/** R14 retry/backoff semantics: bounded attempts, doubling wait capped
  * at the max, failure rethrown after exhaustion. The sleeper is
  * injected, so the schedule is asserted without wall-clock waits. */
class RetrySpec extends AnyFunSuite {

  test("first-try success sleeps nowhere") {
    var sleeps = List.empty[Long]
    val r = Retry.withBackoff(5, 100, 60000, sleeps :+= _)(42)
    assert(r == 42 && sleeps.isEmpty)
  }

  test("two transient failures: doubling backoff, then success") {
    var sleeps = List.empty[Long]
    var calls = 0
    val r = Retry.withBackoff(5, 100, 60000, sleeps :+= _) {
      calls += 1
      if (calls < 3) throw new java.io.IOException("flaky")
      "ok"
    }
    assert(r == "ok" && calls == 3)
    assert(sleeps == List(100L, 200L))
  }

  test("wait is capped at retryMaxWaitMs") {
    var sleeps = List.empty[Long]
    var calls = 0
    Retry.withBackoff(5, 1000, 1500, sleeps :+= _) {
      calls += 1
      if (calls < 5) throw new java.io.IOException("flaky")
      ()
    }
    assert(sleeps == List(1000L, 1500L, 1500L, 1500L))
  }

  test("exhausted attempts rethrow with the cause preserved") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withBackoff(3, 1, 10, _ => ()) {
        calls += 1
        throw new java.io.IOException("down")
      }
    }
    assert(calls == 3)
    assert(e.getMessage.contains("after 3 attempts"))
    assert(e.getCause.getMessage == "down")
  }
}

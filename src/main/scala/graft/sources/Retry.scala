package graft.sources

/** Reference R14/R15 operational semantics
  * (`/root/reference/Test_census_tract.py:138-142,344`): bounded
  * retry with exponential backoff around the fetch, and a fixed
  * pre-fetch throttle. Re-homed as source-connector behavior — each
  * DSv2 partition read (= one chunk GET in the reference) retries
  * independently, and Spark's own task retry layers on top (subsuming
  * the reference's degraded per-state fallback loop, SURVEY §4.1).
  *
  * The backoff is deterministic doubling capped at `maxWaitMs` where
  * the reference uses tenacity's random-exponential with the same cap —
  * same envelope, reproducible tests. `sleep` is injectable so tests
  * assert the schedule without wall-clock waits.
  */
object Retry {
  def withBackoff[T](maxAttempts: Int, baseWaitMs: Long, maxWaitMs: Long,
      sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    var attempt = 0
    var wait = baseWaitMs
    while (true) {
      attempt += 1
      try return f
      catch {
        case e: Exception if attempt < maxAttempts =>
          sleep(math.min(wait, maxWaitMs))
          wait = math.min(wait * 2, maxWaitMs)
        case e: Exception =>
          throw new RuntimeException(
            s"census fetch failed after $attempt attempts", e)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

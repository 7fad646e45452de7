package graft.sources

/** Thrown when the breaker is OPEN: the call was rejected WITHOUT
  * touching the dependency — the caller sees a distinct fault class
  * (back off / defer), not the dependency's own error.
  */
final class CircuitOpenException(remainingMs: Long)
  extends RuntimeException(
    s"circuit open: short-circuited, ${remainingMs}ms of cooldown left")

/** Circuit breaker for a flaky upstream dependency — the fault class the
  * retry family does NOT cover (reference README.md:12, 32: fault
  * tolerance for API sources): `withRetry` re-attempts ONE request and
  * `RateLimitedEndpoint` models the server protecting itself; the
  * breaker is the CLIENT protecting the server (and its own latency
  * budget) when the dependency is hard-down. Retrying a dead endpoint
  * per page turns one outage into attempts × pages of added latency and
  * load; the breaker fails fast instead.
  *
  * Classic three-state machine:
  *  - CLOSED: calls pass through; `failThreshold` CONSECUTIVE failures
  *    trip it (any success resets the streak).
  *  - OPEN: calls short-circuit with [[CircuitOpenException]] — the
  *    dependency is not touched at all — until `cooldownMs` elapses.
  *  - HALF_OPEN: after cooldown, exactly ONE probe call passes through;
  *    success closes the breaker, failure re-opens it for a fresh
  *    cooldown.
  *
  * The clock is injectable (the RateLimitedEndpoint discipline) so both
  * the registry entry and the specs drive a VIRTUAL timeline — no
  * wall-clock sleeps anywhere, and the transition log is deterministic.
  * `transitions` records every state change with its timestamp;
  * `shortCircuitCount` counts rejected calls (calls the dependency
  * never saw), both observable for the specs.
  */
final class CircuitBreaker(
    failThreshold: Int, cooldownMs: Long, clock: () => Long) {

  private var state: String = "closed"
  private var consecFails: Int = 0
  private var openedAt: Long = 0L
  // True while the single half-open probe is in flight: further callers
  // short-circuit until it resolves, so "exactly ONE probe" holds under
  // concurrency too (not just for the single-threaded driver loops).
  private var probing: Boolean = false
  private val log = scala.collection.mutable.ArrayBuffer[(String, Long)]()
  private var shorted: Long = 0L

  def currentState: String = synchronized(state)
  def transitions: Seq[(String, Long)] = synchronized(log.toSeq)
  def shortCircuitCount: Long = synchronized(shorted)

  private def moveTo(s: String, at: Long): Unit = {
    state = s
    log += ((s, at))
  }

  def call[T](f: => T): T = {
    // Whether THIS call was admitted as the half-open probe. Only the
    // probe may clear `probing` and drive the half_open → closed/open
    // transitions: a straggler admitted while CLOSED that resolves
    // after the breaker trips must not reset another thread's
    // in-flight probe flag (a second probe could then pass) or settle
    // the half-open verdict with a stale result — it only updates the
    // consecutive-failure streak.
    var admittedAsProbe = false
    synchronized {
      val now = clock()
      if (state == "open") {
        if (now - openedAt >= cooldownMs) moveTo("half_open", now)
        else {
          shorted += 1
          throw new CircuitOpenException(cooldownMs - (now - openedAt))
        }
      }
      if (state == "half_open") {
        if (probing) { // a probe is already in flight — reject, don't pile on
          shorted += 1
          throw new CircuitOpenException(0L)
        }
        probing = true
        admittedAsProbe = true
      }
    }
    try {
      val r = f
      synchronized {
        consecFails = 0
        if (admittedAsProbe) {
          probing = false
          if (state == "half_open") moveTo("closed", clock())
        }
      }
      r
    } catch {
      case e: Throwable =>
        synchronized {
          val now = clock()
          if (admittedAsProbe) {
            probing = false
            if (state == "half_open") {
              openedAt = now
              moveTo("open", now)
            }
          } else {
            consecFails += 1
            if (state == "closed" && consecFails >= failThreshold) {
              openedAt = now
              moveTo("open", now)
            }
          }
        }
        throw e
    }
  }
}

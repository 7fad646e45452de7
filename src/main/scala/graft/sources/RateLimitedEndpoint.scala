package graft.sources

import java.util.concurrent.atomic.AtomicLong

/** The simulated HTTP 429 signal: carries the server's `Retry-After`
  * hint in milliseconds, exactly like the header a real provider sends
  * (README.md:12 "rate limits", :32 "Test for … rate limits"). A client
  * that honors the hint sleeps `retryAfterMs` and re-requests; a client
  * that ignores it keeps bouncing off the same empty bucket.
  */
final class RateLimitException(val retryAfterMs: Long, page: Int)
  extends RuntimeException(
    s"simulated 429 Too Many Requests on page $page: Retry-After ${retryAfterMs}ms")

/** A server-side rate limiter the CLIENT cannot see into — the
  * counterpart of [[RatePacer]], which is client-side prevention. Token
  * bucket: `capacity` requests may burst, then one token refills every
  * `refillIntervalMs`. A request finding the bucket empty is rejected
  * with a 429 whose Retry-After is the exact time until the next refill
  * — the contract real providers publish, and the one the reference
  * mandates handling as a fault class distinct from 503-retry (which
  * clears on ANY re-attempt; a 429 clears only after the window).
  *
  * The clock is injectable so specs drive a virtual timeline: no
  * wall-clock sleeps, and the "un-throttled client starves forever"
  * property is provable deterministically. `servedCount`/`rejectedCount`
  * are observable for the same reason `RatePacer.acquireCount` is.
  */
final class RateLimitedEndpoint(
    capacity: Int, refillIntervalMs: Long,
    clock: () => Long = () => System.nanoTime() / 1000000L) {

  private var tokens: Long = capacity.toLong
  private var lastRefill: Long = Long.MinValue

  private val served = new AtomicLong(0L)
  private val rejected = new AtomicLong(0L)
  def servedCount: Long = served.get()
  def rejectedCount: Long = rejected.get()

  /** Serve one request or throw the 429. Thread-safe; refill is computed
    * lazily from elapsed time (no background thread), and `lastRefill`
    * advances in whole intervals so the schedule never drifts.
    */
  def request(page: Int): Unit = synchronized {
    val now = clock()
    if (lastRefill == Long.MinValue) lastRefill = now
    val refills = (now - lastRefill) / refillIntervalMs
    if (refills > 0) {
      tokens = math.min(capacity.toLong, tokens + refills)
      lastRefill += refills * refillIntervalMs
    }
    if (tokens > 0) {
      tokens -= 1
      served.incrementAndGet()
    } else {
      rejected.incrementAndGet()
      throw new RateLimitException(
        refillIntervalMs - (now - lastRefill), page)
    }
  }
}

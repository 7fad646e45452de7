package graft.sources

/** Min-interval request pacer for API-shaped sources (README.md:12 "rate
  * limits"): `withRetry` reacts AFTER a 429; the pacer prevents the 429 by
  * spacing requests at least `minIntervalMs` apart — the reciprocal of the
  * provider's requests-per-second budget. Token-bucket with depth 1: the
  * first request is never delayed, each later request waits out only the
  * REMAINDER of the interval (a slow consumer pays nothing), and the
  * schedule advances by exact interval steps under burst so N queued
  * requests drain at precisely the contracted rate rather than drifting by
  * per-sleep jitter. `clock`/`sleeper` are injectable so specs assert the
  * exact spacing on a virtual clock without wall-clock sleeps.
  *
  * Scale note: one pacer paces one JVM. On a cluster the executor-side
  * form (PagedJsonSource `paceMs`) gives each executor JVM its own bucket,
  * so the provider-facing budget is `rate × numExecutors` — set the
  * per-executor interval to `numExecutors / globalRate` seconds when the
  * quota is account-global. A truly global limiter needs an external
  * coordinator, which is out of scope for a source connector.
  */
final class RatePacer(
    minIntervalMs: Long,
    clock: () => Long = () => System.nanoTime() / 1000000L,
    sleeper: Long => Unit = Thread.sleep) {

  // next time a request may be issued; MinValue = no request seen yet
  private var nextAllowed: Long = Long.MinValue

  // slots granted so far — observable, so specs can assert that a code
  // path (e.g. a DSv2 reader open) really went through this bucket
  // without resorting to wall-clock timing
  private val granted = new java.util.concurrent.atomic.AtomicLong(0L)
  def acquireCount: Long = granted.get()

  /** Block (via `sleeper`) until a request slot is available, then consume
    * it. Thread-safe: concurrent page readers in one JVM serialize here.
    */
  def acquire(): Unit = synchronized {
    granted.incrementAndGet()
    val now = clock()
    if (nextAllowed != Long.MinValue && now < nextAllowed) {
      sleeper(nextAllowed - now)
      // schedule from the granted slot, not the post-sleep clock: exact
      // interval steps under burst, no cumulative oversleep drift
      nextAllowed += minIntervalMs
    } else {
      nextAllowed = now + minIntervalMs
    }
  }
}

object RatePacer {
  // executor-side registry: one pacer per (JVM, interval), so all page
  // readers in an executor share one bucket (see class scale note)
  private val shared = new java.util.concurrent.ConcurrentHashMap[Long, RatePacer]()
  def forInterval(minIntervalMs: Long): RatePacer =
    shared.computeIfAbsent(minIntervalMs, ms => new RatePacer(ms))
}

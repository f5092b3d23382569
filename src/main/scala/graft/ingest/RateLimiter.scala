package graft.ingest

/** Request-spacing rate limiter (ethical_crawler.py:293–302): ensure
  * ≥ 1/ratePerSecond elapses between consecutive requests to one
  * source. Clock and sleeper are injectable → deterministic tests.
  *
  * Scale note: this throttles the DRIVER-side ingestion client (the
  * polite-crawling contract is per source, global — exactly why the
  * fetch loop is not distributed). In a streaming source the same
  * budget becomes a `maxOffsetsPerTrigger`-style option.
  */
final class RateLimiter(
    ratePerSecond: Double,
    nanoTime: () => Long = System.nanoTime,
    sleepMillis: Long => Unit = Thread.sleep) {

  require(ratePerSecond > 0, "ratePerSecond must be positive")

  private val minIntervalNanos = (1e9 / ratePerSecond).toLong
  private var lastRequest: Option[Long] = None

  /** Block (if needed) until the next request is permitted, then mark
    * it. Returns the milliseconds actually waited.
    */
  def acquire(): Long = synchronized {
    val now = nanoTime()
    val waitedMs = lastRequest match {
      case Some(last) =>
        val elapsed = now - last
        if (elapsed < minIntervalNanos) {
          val ms = (minIntervalNanos - elapsed) / 1000000
          if (ms > 0) sleepMillis(ms)
          ms
        } else 0L
      case None => 0L
    }
    lastRequest = Some(nanoTime())
    waitedMs
  }
}

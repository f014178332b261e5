package graft.ops

import scala.annotation.tailrec
import scala.util.{Failure, Success, Try}

/** Driver-side ingestion pacing + retry (SURVEY §2.1 S3/S4): the
  * offline analogue of the reference's crawl discipline — 25 s timeout
  * with 5 retries (/root/reference/mapwarper.js:12-16) and fixed
  * inter-request sleeps (SLEEP_MS, mapwarper.js:18,33-36).
  *
  * These run on the DRIVER around page acquisition (an inherently
  * serial, rate-limited courtesy loop); everything after the pages
  * land is distributed (PagedNdjsonSource plans one partition per
  * page). Pure functions over an injected fetch so they unit-test
  * without a network.
  */
object Ingest {

  /** Retry with fixed backoff: up to `retries` re-attempts after the
    * first failure, sleeping `backoffMs` between attempts. */
  def withRetry[T](retries: Int, backoffMs: Long = 0L)(f: () => Try[T]): Try[T] = {
    @tailrec
    def loop(left: Int): Try[T] = f() match {
      case s @ Success(_) => s
      case fail @ Failure(_) =>
        if (left <= 0) fail
        else {
          if (backoffMs > 0) Thread.sleep(backoffMs)
          loop(left - 1)
        }
    }
    loop(retries)
  }

  /** Token-bucket throttle: at most one permit per `intervalMs`.
    * (The reference's fixed `SLEEP_MS` pacing generalized — a bucket
    * absorbs bursts without stretching total crawl time.) */
  final class Throttle(intervalMs: Long, clock: () => Long) {
    private var nextFree = 0L
    /** ms the caller must wait before proceeding; advances the bucket. */
    def acquireDelay(): Long = synchronized {
      val now = clock()
      val wait = math.max(0L, nextFree - now)
      nextFree = math.max(now, nextFree) + intervalMs
      wait
    }
  }

  /** Paginated fetch loop with in-band errors: pages are fetched
    * sequentially (rate-limited, like the reference's `series()`);
    * each result is Right(lines) or Left(error) — a failed page never
    * aborts the crawl (mirrors {type:'error'} records,
    * /root/reference/mapwarper.js:123-129). Stops on the first short
    * page (termination rule, mapwarper.js:138-143). */
  def fetchAllPages(perPage: Int, retries: Int)(
      fetch: Int => Try[Seq[String]]): Seq[(Int, Either[String, Seq[String]])] = {
    val out = Seq.newBuilder[(Int, Either[String, Seq[String]])]
    var page = 0
    var done = false
    while (!done) {
      withRetry(retries)(() => fetch(page)) match {
        case Success(lines) =>
          out += ((page, Right(lines)))
          if (lines.length < perPage) done = true
        case Failure(e) =>
          out += ((page, Left(e.getMessage)))
          done = true // can't trust total count after a hard failure
      }
      page += 1
    }
    out.result()
  }
}

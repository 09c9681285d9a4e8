package graft.sources

import scala.annotation.tailrec
import scala.util.{Failure, Success, Try}

/** Retryable-error contract of the reference's ingest edge.
  *
  * The reference delegates retries to an external backoff layer whose
  * behavior is pinned by its tests (SURVEY.md intro): HTTP 429 → retry up to
  * 3 attempts; retryable service errors → 3 attempts; non-retryable error
  * codes → raise immediately (reference
  * tests/unit/test_get_train_status.py:83-106, 247-280). This realizes that
  * observable contract as a pure, injectable utility — the driver-side fetch
  * of the S1 poll source uses it; Spark task retries cover everything
  * distributed.
  */
object Backoff {
  final case class RetryableError(message: String, cause: Throwable = null)
    extends RuntimeException(message, cause)

  /** Run `f`, retrying on RetryableError up to `attempts` total tries.
    * Any other exception propagates immediately (non-retryable). */
  @tailrec
  def retry[T](attempts: Int, sleepMs: Long = 0L,
      sleeper: Long => Unit = Thread.sleep)(f: () => T): T = {
    require(attempts >= 1)
    Try(f()) match {
      case Success(v) => v
      case Failure(e: RetryableError) if attempts > 1 =>
        if (sleepMs > 0) sleeper(sleepMs)
        retry(attempts - 1, sleepMs * 2, sleeper)(f)
      case Failure(e) => throw e
    }
  }
}

/** Driver-side poll of the Train-Tracker API (S1) with the reference's
  * pinned retry budget. HTTP transport is injected so the fetch is testable
  * offline and swappable (reference get_train_status.py:29-43 builds
  * ttpositions.aspx?key=…&rt=…&outputType=JSON).
  */
object RestPoller {
  val MaxAttempts = 3 // reference tests pin 3 attempts on HTTP 429

  final case class HttpResponse(status: Int, body: String)

  def url(base: String, apiKey: String, line: String): String =
    s"$base/ttpositions.aspx?key=$apiKey&rt=$line&outputType=JSON"

  /** Fetch one line's positions document. 429 retried ≤3; other non-2xx
    * raise immediately (the reference's raise_for_status). */
  def fetchLine(base: String, apiKey: String, line: String,
      http: String => HttpResponse,
      sleeper: Long => Unit = Thread.sleep): String =
    Backoff.retry(MaxAttempts, sleepMs = 100L, sleeper = sleeper) { () =>
      val resp = http(url(base, apiKey, line))
      resp.status match {
        case s if s >= 200 && s < 300 => resp.body
        case 429 => throw Backoff.RetryableError("HTTP 429 rate limited")
        case s => throw new RuntimeException(s"HTTP $s")
      }
    }
}

package graft.streaming

import scala.util.control.NonFatal

/** Retry with exponential backoff + jitter (SURVEY.md §2.9 T9;
  * reference `utils/error_handler.py:32-41,81-150` — exp backoff with
  * ±20% jitter and retryable-vs-not classification). The circuit
  * breaker is intentionally dropped (§2.9: Spark's driver restart
  * policy covers it). Sink writes wrap in this; non-retryable errors
  * (schema conflicts — deterministic, retrying can't help) propagate
  * immediately to the DLQ branch.
  */
object Retry {

  /** Deterministic-jitter backoff: attempt n sleeps
    * base·2ⁿ·(0.8 + 0.4·frac(hash)) ms. */
  def withBackoff[T](maxAttempts: Int = 3, baseMillis: Long = 100,
      retryable: Throwable => Boolean = defaultRetryable)(f: => T): T = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < maxAttempts) {
      try return f
      catch {
        case NonFatal(e) if retryable(e) && attempt < maxAttempts - 1 =>
          lastErr = e
          val jitter = 0.8 + 0.4 *
            (math.abs((attempt * 2654435761L).toInt) % 1000) / 1000.0
          Thread.sleep((baseMillis * (1L << attempt) * jitter).toLong)
          attempt += 1
        case NonFatal(e) =>
          throw e
      }
    }
    throw lastErr
  }

  /** Classification mirroring the reference: IO/availability errors
    * retry; schema conflicts and semantic errors do not. */
  def defaultRetryable(e: Throwable): Boolean = e match {
    case _: graft.core.SchemaMerge.SchemaConflictException => false
    case _: java.io.IOException => true
    case _: java.util.concurrent.TimeoutException => true
    case e if e.getMessage != null &&
      e.getMessage.toLowerCase.contains("timeout") => true
    case _ => false
  }
}

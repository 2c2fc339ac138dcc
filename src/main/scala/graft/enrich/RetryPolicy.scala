package graft.enrich

import scala.util.control.NonFatal

/** Retry/backoff policy object — the reference's two client-retry shapes,
  * made a first-class, clock-stubbed component:
  *
  *  - the classification call's tenacity decorator
  *    (`TopicClassfication.py:142-148`): `stop_after_attempt(5)` +
  *    `wait_exponential(multiplier=1, min=4, max=60)` + retry only on
  *    retryable exception types + `reraise=True`;
  *  - the corrector's manual attempt loop (`recorrect_mapping.py:107-127`):
  *    catch, sleep, retry, and after the last attempt GIVE UP with None —
  *    which downstream keeps the original mapping
  *    (`recorrect_mapping.py:186-191`).
  *
  * `sleep` is injectable so specs pin the exact schedule without
  * wall-clock waits; executors use the default `Thread.sleep`. The policy
  * wraps any thunk — no network anywhere in the engine; the hermetic
  * stand-ins ([[TopicEnrichment.StubTopicClassifier]],
  * [[graft.resolve.PromoteSecondCorrector]]) never throw, but the wiring
  * runs through the policy so a real client drops in with retry semantics
  * already in place.
  */
final case class RetryPolicy(
    maxAttempts: Int = 5,
    minDelayMs: Long = 4000L,
    maxDelayMs: Long = 60000L,
    multiplierMs: Long = 1000L,
    retryable: Throwable => Boolean = RetryPolicy.RetryAll,
    sleep: Long => Unit = RetryPolicy.RealSleep) extends Serializable {

  require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")

  /** tenacity `wait_exponential`: multiplier · 2^attempt, clamped to
    * [min, max], where `attempt` is the 1-based attempt that just failed.
    * Default schedule before attempts 2..5: 4 s, 4 s, 8 s, 16 s (2 s and
    * 2⁵⁺ s clamp to the 4/60 rails).
    */
  def delayMs(attempt: Int): Long = {
    val raw = multiplierMs * (1L << math.min(math.max(attempt, 0), 55))
    math.min(maxDelayMs, math.max(minDelayMs, raw))
  }

  /** Run `f` under the policy; rethrow the last failure once attempts are
    * exhausted or on the first non-retryable one (`reraise=True`).
    */
  def call[A](f: => A): A = {
    var attempt = 1
    while (true) {
      try return f
      catch {
        case e if NonFatal(e) =>
          if (attempt >= maxAttempts || !retryable(e)) throw e
          sleep(delayMs(attempt))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The corrector loop's shape: exhausted retries (or a non-retryable
    * failure) yield None instead of throwing — "达到最大重试次数，放弃此簇"
    * (`recorrect_mapping.py:125-127`), which keeps the original mapping
    * downstream.
    */
  def callOpt[A](f: => A): Option[A] =
    try Some(call(f)) catch { case e if NonFatal(e) => None }
}

object RetryPolicy {
  /** The corrector's `except Exception` — every non-fatal throwable
    * retries. A real API client narrows this to its transport/rate-limit
    * types, the tenacity `RETRYABLE_EXCEPTIONS` tuple.
    */
  val RetryAll: Throwable => Boolean = NonFatal(_)

  val RealSleep: Long => Unit = Thread.sleep
}

/** [[TopicEnrichment.TopicClassifier]] with the policy applied per call —
  * the decorated `get_classification_from_openai_async`
  * (`TopicClassfication.py:151`). Exhausted retries RETHROW: the
  * reference marks that document's classification an error downstream,
  * which in this engine is the task failing loudly rather than silently
  * mislabeling (the validating join handles in-band invalid ids; transport
  * failure is out-of-band).
  */
final case class RetryingClassifier(
    inner: TopicEnrichment.TopicClassifier,
    policy: RetryPolicy) extends TopicEnrichment.TopicClassifier {
  def classify(docId: Long, title: String): Long =
    policy.call(inner.classify(docId, title))
}

/** [[graft.resolve.MappingCorrector]] with the policy applied per cluster
  * — give-up yields None, and [[graft.resolve.MappingCorrector.refineMapping]]
  * keeps that cluster's ORIGINAL mapping (`recorrect_mapping.py:186-191`).
  */
final case class RetryingCorrector(
    inner: graft.resolve.MappingCorrector,
    policy: RetryPolicy) extends graft.resolve.MappingCorrector {
  def correct(clusterString: String): Option[String] =
    policy.callOpt(inner.correct(clusterString)).flatten
}

package graft.enrich

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.resolve.{MappingCorrector, PromoteSecondCorrector}

/** The retry/backoff policy: exact tenacity schedule
  * (stop_after_attempt(5), wait_exponential(multiplier=1, min=4, max=60)
  * — `TopicClassfication.py:142-148`), attempt counting, non-retryable
  * passthrough, and the give-up-keeps-original corrector semantics
  * (`recorrect_mapping.py:107-127,186-191`). All clock-stubbed — no test
  * sleeps.
  */
class RetryPolicySpec extends AnyFunSuite {

  private class Recorder {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val record: Long => Unit = sleeps += _
  }

  private def failing(times: Int): () => String = {
    var calls = 0
    () => {
      calls += 1
      if (calls <= times) throw new RuntimeException(s"boom $calls")
      s"ok after $calls"
    }
  }

  test("default schedule: 4s, 4s, 8s, 16s then reraise on attempt 5") {
    val r = new Recorder
    val p = RetryPolicy(sleep = r.record)
    val f = failing(times = Int.MaxValue)
    val e = intercept[RuntimeException] { p.call(f()) }
    assert(e.getMessage === "boom 5") // exactly 5 attempts, last one rethrown
    assert(r.sleeps.toSeq === Seq(4000L, 4000L, 8000L, 16000L))
  }

  test("delay clamps to the 60s rail and the 4s floor") {
    val p = RetryPolicy()
    assert(p.delayMs(1) === 4000L)  // 2s → floor 4s
    assert(p.delayMs(2) === 4000L)
    assert(p.delayMs(3) === 8000L)
    assert(p.delayMs(4) === 16000L)
    assert(p.delayMs(5) === 32000L)
    assert(p.delayMs(6) === 60000L) // 64s → rail 60s
    assert(p.delayMs(40) === 60000L) // no overflow at large attempts
  }

  test("success mid-schedule stops retrying") {
    val r = new Recorder
    val p = RetryPolicy(sleep = r.record)
    val f = failing(times = 2) // hoisted: the by-name arg re-runs f() only
    assert(p.call(f()) === "ok after 3")
    assert(r.sleeps.toSeq === Seq(4000L, 4000L))
  }

  test("non-retryable failures rethrow immediately, no sleep") {
    val r = new Recorder
    val p = RetryPolicy(sleep = r.record,
      retryable = !_.isInstanceOf[IllegalArgumentException])
    val e = intercept[IllegalArgumentException] {
      p.call(throw new IllegalArgumentException("bad input"))
    }
    assert(e.getMessage === "bad input")
    assert(r.sleeps.isEmpty)
  }

  test("callOpt: exhausted retries give up as None (corrector shape)") {
    val r = new Recorder
    val p = RetryPolicy(sleep = r.record)
    val fDown = failing(times = Int.MaxValue)
    assert(p.callOpt(fDown()) === None)
    assert(r.sleeps.size === 4) // still the full schedule before giving up
    val fOnce = failing(times = 1)
    assert(p.callOpt(fOnce()) === Some("ok after 2"))
  }

  test("RetryingClassifier retries a flaky client to the stub's answer") {
    val r = new Recorder
    val flaky = new TopicEnrichment.TopicClassifier {
      private val seen = new java.util.concurrent.ConcurrentHashMap[Long, Boolean]
      def classify(docId: Long, title: String): Long = {
        // first call for each doc fails — a transient transport error
        if (seen.putIfAbsent(docId, true) == null)
          throw new RuntimeException("connection reset")
        TopicEnrichment.StubTopicClassifier.classify(docId, title)
      }
    }
    val wrapped = RetryingClassifier(flaky, RetryPolicy(sleep = r.record))
    assert(wrapped.classify(37L, "t") === 99L)
    assert(wrapped.classify(5L, "t") === 6L)
    assert(r.sleeps.toSeq === Seq(4000L, 4000L)) // one retry per doc
  }

  test("give-up keeps the original mapping through refineMapping") {
    val spark = TestSpark.spark
    import spark.implicits._
    val mapping = Seq(
      ("a", "rep1"), ("b", "rep1"), ("c", "rep1"), // large cluster
      ("x", "rep2")) // small cluster — below the gate either way
      .toDF("original", "representative")
    val alwaysDown = RetryingCorrector(
      new MappingCorrector {
        def correct(c: String): Option[String] =
          throw new RuntimeException("503")
      },
      RetryPolicy(sleep = _ => ()))
    val kept = MappingCorrector
      .refineMapping(mapping, alwaysDown, minClusterSize = 3)
      .as[(String, String)].collect().toSet
    assert(kept === Set(("a", "rep1"), ("b", "rep1"), ("c", "rep1"),
      ("x", "rep2"))) // unchanged — the reference's fallback
    // same pipeline with a healthy corrector DOES rewrite the big cluster
    val healthy = RetryingCorrector(
      PromoteSecondCorrector, RetryPolicy(sleep = _ => ()))
    val fixed = MappingCorrector
      .refineMapping(mapping, healthy, minClusterSize = 3)
      .as[(String, String)].collect().toSet
    assert(fixed === Set(("a", "b"), ("b", "b"), ("c", "b"), ("x", "rep2")))
  }
}

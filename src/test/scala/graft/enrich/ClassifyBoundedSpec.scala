package graft.enrich

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import TopicEnrichment.TopicClassifier

/** Concurrency tracker shared across local-mode tasks (JVM-static). The
  * barrier makes the first `K` calls wait for each other — the test can
  * only pass if K calls are genuinely in flight at once — and the
  * high-water mark proves the cap is never exceeded.
  */
object TrackingClassifier extends TopicClassifier {
  val K = 4
  val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
  val firstWave = new java.util.concurrent.CyclicBarrier(K)
  val waveProven = new java.util.concurrent.atomic.AtomicBoolean(false)

  def reset(): Unit = { inFlight.set(0); maxSeen.set(0); waveProven.set(false) }

  def classify(docId: Long, title: String): Long = {
    val cur = inFlight.incrementAndGet()
    maxSeen.getAndUpdate(m => math.max(m, cur))
    try {
      if (!waveProven.get()) {
        // first K callers rendezvous — succeeds only with K concurrent
        try {
          firstWave.await(5, java.util.concurrent.TimeUnit.SECONDS)
          waveProven.set(true)
        } catch { case _: Exception => () }
      }
      docId % 22 + 1
    } finally inFlight.decrementAndGet()
  }
}

class ClassifyBoundedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("per-partition in-flight calls reach the cap and never exceed it") {
    TrackingClassifier.reset()
    val docs = Seq.tabulate(32)(i => (i.toLong, s"T$i"))
      .toDF("doc_id", "title").repartition(1) // one partition: one pool
    val out = TopicEnrichment.classifyBounded(docs, TrackingClassifier,
      maxConcurrent = TrackingClassifier.K).collect()
    assert(out.length === 32)
    assert(TrackingClassifier.waveProven.get(),
      "the first K calls never ran concurrently")
    assert(TrackingClassifier.maxSeen.get() <= TrackingClassifier.K,
      s"in-flight count ${TrackingClassifier.maxSeen.get()} exceeded the cap")
  }

  test("results keep input order and append topic_id; columns pass through") {
    val docs = Seq((3L, "A", "x"), (1L, "B", "y"), (2L, "C", "z"))
      .toDF("doc_id", "title", "other").repartition(1)
    val out = TopicEnrichment.classifyBounded(docs,
      TopicEnrichment.StubTopicClassifier, maxConcurrent = 2)
    assert(out.columns.toSeq === Seq("doc_id", "title", "other", "topic_id"))
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(2), r.getLong(3))).toSeq
    assert(rows === Seq((3L, "x", 4L), (1L, "y", 2L), (2L, "z", 3L)))
  }

  test("invalid ids from the client surface as status=error downstream") {
    // doc_id 0 and 37 hit the stub's invalid-99 path on the synthetic
    // fixture; the validating join marks exactly those as errors
    val bad = TopicEnrichment.classified(spark, graft.TestSpark.TinySf)
      .filter($"status" === "error").select($"topic_id").distinct()
      .as[Long].collect().toSeq
    assert(bad === Seq(99L))
  }
}

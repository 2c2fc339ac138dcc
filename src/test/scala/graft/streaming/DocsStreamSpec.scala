package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The streaming near-dedup gate: cross-batch state carry, in-order
  * stream ≡ batch mode, and the per-bucket state cap.
  */
class DocsStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def runStream(batches: Seq[Seq[(Long, String)]], name: String):
      Set[(Long, Long, Int)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = DocsStream.nearDedupStream(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[(Long, Long, Int)].collect().toSet
    } finally q.stop()
  }

  test("duplicate arriving in a later micro-batch hits state from an earlier one") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta"
    val b = "completely different words here now ok"
    val got = runStream(Seq(Seq(1L -> a, 2L -> b), Seq(3L -> a)), "dup_x")
    // doc 3 duplicates doc 1 (identical text -> hamming 0) across batches;
    // it may surface via one or both bands, but never as a dup of doc 2
    assert(got.map(h => (h._1, h._2)).contains((3L, 1L)))
    assert(got.forall(h => h._3 == 0 || h._2 != 1L || h._1 != 3L))
    assert(!got.map(h => (h._1, h._2)).contains((3L, 2L)))
  }

  test("an in-order stream over two batches equals batch mode on the union") {
    import spark.implicits._
    val docs = (0L until 40L).map(i =>
      i -> (if (i % 7 == 0) "the quick brown fox jumps over dogs"
            else s"word$i token$i stuff$i filler$i pad$i end$i"))
    val streamed = runStream(Seq(docs.take(20), docs.drop(20)), "dup_eq")
    val batch = DocsStream
      .nearDedupStream(docs.toDF("doc_id", "text"))
      .collect().map(h => (h.doc_id, h.dup_of, h.hamming)).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty, "fixture must actually produce duplicates")
  }

  test("TTL variant: a duplicate past the window is not flagged; within it, it is") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(min: Long) = new java.sql.Timestamp(min * 60000L)
    val same = "alpha beta gamma delta epsilon zeta"
    val other = "completely different words here now ok"
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = DocsStream.nearDedupStreamTtl(
        in.toDF().toDF("doc_id", "text", "ts"), ttlMs = 60L * 60000L)
      .writeStream.format("memory").queryName("dup_ttl")
      .outputMode("append").start()
    try {
      in.addData((1L, same, t(0)))
      q.processAllAvailable()
      // unrelated doc 3h later advances the watermark past doc 1 + ttl
      in.addData((2L, other, t(180)))
      q.processAllAvailable()
      // duplicate of doc 1 AFTER the window: state pruned, no flag;
      // doc 3 becomes the fresh holder
      in.addData((3L, same, t(185)))
      q.processAllAvailable()
      // duplicate WITHIN the window of doc 3: flagged against 3 only
      in.addData((4L, same, t(186)))
      q.processAllAvailable()
      val hits = spark.table("dup_ttl")
        .as[(Long, Long, Int)].collect().toSet
      assert(hits === Set((4L, 3L, 0)))
    } finally q.stop()
  }

  test("a bucket caps at MaxBucket holders; later docs probe but never hold") {
    import spark.implicits._
    // identical text -> identical signature -> both bands of every doc
    // land in the same two buckets; holders = first MaxBucket doc_ids
    val n = graft.dedup.Dedup.MaxBucket + 10
    val docs = (0L until n.toLong).map(i => i -> "same same same same same")
    val got = DocsStream.nearDedupStream(docs.toDF("doc_id", "text"))
      .collect().map(h => (h.doc_id, h.dup_of)).toSet
    val held = graft.dedup.Dedup.MaxBucket.toLong
    // every doc past the cap matches ONLY the first `held` docs
    val overflow = got.filter(_._1 >= held)
    assert(overflow.nonEmpty && overflow.forall(_._2 < held))
    // and no doc ever matches a doc past the cap
    assert(got.forall(_._2 < held))
  }
}

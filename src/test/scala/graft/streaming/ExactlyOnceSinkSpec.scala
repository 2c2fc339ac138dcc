package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Exactly-once landing: duplicate micro-batch replay leaves the landing
  * zone AND the folded bucketed table unchanged, and the fold is
  * idempotent (re-running it is a no-op on content). Also drives a real
  * MemoryStream through the foreachBatch wiring end-to-end.
  */
class ExactlyOnceSinkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def zone() =
    Files.createTempDirectory("eo_sink").toString + "/zone"

  test("replayed batch rewrites only its own partition; fold is idempotent") {
    val dir = zone()
    val b0 = Seq((1L, "v1"), (2L, "v1")).toDF("doc_id", "text")
    val b1 = Seq((2L, "v2"), (3L, "v1")).toDF("doc_id", "text")
    ExactlyOnceSink.landBatch(b0, 0L, dir)
    ExactlyOnceSink.landBatch(b1, 1L, dir)
    def state() = ExactlyOnceSink.landed(spark, dir)
      .select($"doc_id", $"text", $"batch_id".cast("long"))
      .as[(Long, String, Long)].collect().toSet
    val want = Set((1L, "v1", 0L), (2L, "v1", 0L), (2L, "v2", 1L), (3L, "v1", 1L))
    assert(state() === want)

    // at-least-once delivery: the SAME batch id re-delivers the same
    // rows — the landing zone must converge, not accumulate
    ExactlyOnceSink.landBatch(b1, 1L, dir)
    assert(state() === want, "replay must leave the landing zone unchanged")
    // ...and must not have touched the sibling batch-0 partition
    assert(ExactlyOnceSink.landed(spark, dir)
      .filter($"batch_id" === 0).count() === 2)

    // fold to the bucketed serving table: latest batch wins per key
    ExactlyOnceSink.foldIntoBucketed(spark, dir, "eo_docs", "doc_id", 8)
    def folded() = spark.table("eo_docs")
      .as[(Long, String)].collect().toSet
    val wantFolded = Set((1L, "v1"), (2L, "v2"), (3L, "v1"))
    assert(folded() === wantFolded)

    // replay + re-fold: byte-identical serving content
    ExactlyOnceSink.landBatch(b1, 1L, dir)
    ExactlyOnceSink.foldIntoBucketed(spark, dir, "eo_docs", "doc_id", 8)
    assert(folded() === wantFolded, "fold after replay must be a content no-op")
    ExactlyOnceSink.foldIntoBucketed(spark, dir, "eo_docs", "doc_id", 8)
    assert(folded() === wantFolded, "double fold must be a content no-op")
  }

  test("pruned batches survive re-folds through the base layer") {
    val dir = zone()
    ExactlyOnceSink.landBatch(
      Seq((1L, "only-in-b0"), (2L, "v1")).toDF("doc_id", "text"), 0L, dir)
    ExactlyOnceSink.landBatch(
      Seq((2L, "v2")).toDF("doc_id", "text"), 1L, dir)
    ExactlyOnceSink.foldIntoBucketed(spark, dir, "eo_docs_prune", "doc_id", 8)
    // batches 0-1 are folded: prune them (filesystem check — a
    // partition-less dir can't even be read as parquet)
    ExactlyOnceSink.pruneLanded(spark, dir, 1L)
    assert(Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .count(_.getName.startsWith("batch_id=")) === 0)
    // folding an empty zone is a no-op, not a crash or a truncation
    ExactlyOnceSink.foldIntoBucketed(spark, dir, "eo_docs_prune", "doc_id", 8)
    assert(spark.table("eo_docs_prune").count() === 2)
    // a later batch updates doc 2 and adds doc 3; doc 1 exists ONLY in
    // the pruned batch 0 — the base layer must carry it through
    ExactlyOnceSink.landBatch(
      Seq((2L, "v3"), (3L, "new")).toDF("doc_id", "text"), 2L, dir)
    ExactlyOnceSink.foldIntoBucketed(spark, dir, "eo_docs_prune", "doc_id", 8)
    def folded() = spark.table("eo_docs_prune")
      .as[(Long, String)].collect().toSet
    val want = Set((1L, "only-in-b0"), (2L, "v3"), (3L, "new"))
    assert(folded() === want)
    // fold again (replay/crash recovery): content no-op
    ExactlyOnceSink.foldIntoBucketed(spark, dir, "eo_docs_prune", "doc_id", 8)
    assert(folded() === want)
    // no stray temp table from the swap
    assert(!spark.catalog.tableExists("eo_docs_prune_fold"))
  }

  test("explicit tieBreak list folds schemas with unorderable (map) columns") {
    val dir = zone()
    import org.apache.spark.sql.functions.{map, lit}
    val b0 = Seq((1L, "v1"), (2L, "v1")).toDF("doc_id", "text")
      .withColumn("props", map(lit("k"), $"text"))
    val b1 = Seq((2L, "v2")).toDF("doc_id", "text")
      .withColumn("props", map(lit("k"), $"text"))
    ExactlyOnceSink.landBatch(b0, 0L, dir)
    ExactlyOnceSink.landBatch(b1, 1L, dir)
    // default tie-break orders by EVERY non-key column → the map column
    // fails analysis LOUDLY (the documented orderable-columns contract
    // for the Nil default), never a silent wrong order
    val e = intercept[Exception] {
      ExactlyOnceSink.foldIntoBucketed(spark, dir, "eo_docs_map", "doc_id", 8)
    }
    assert(e.getMessage.toLowerCase.contains("map") ||
      e.getMessage.toLowerCase.contains("order"),
      s"expected the unorderable-column analysis error, got: ${e.getMessage}")
    // the explicit deterministic column list avoids it
    ExactlyOnceSink.foldIntoBucketed(spark, dir, "eo_docs_map", "doc_id", 8,
      tieBreak = Seq("text"))
    val got = spark.table("eo_docs_map")
      .select($"doc_id", $"text", $"props"("k").as("p"))
      .as[(Long, String, String)].collect().toSet
    assert(got === Set((1L, "v1", "v1"), (2L, "v2", "v2")))
  }

  test("the swap refuses to purge a non-managed table's location") {
    // ADVICE r10: orphan cleanup deleted warehouse/<table> between DROP
    // and RENAME unconditionally — for an EXTERNAL table that directory
    // convention could name data the DROP deliberately left behind. The
    // swap now reads the location from the catalog and REFUSES
    // non-managed targets instead of deleting what it does not own.
    val dir = zone()
    ExactlyOnceSink.landBatch(
      Seq((1L, "v1")).toDF("doc_id", "text"), 0L, dir)
    val extData = Files.createTempDirectory("eo_ext").toString
    Seq((9L, "precious")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(extData)
    spark.sql(s"CREATE TABLE eo_docs_ext (doc_id BIGINT, text STRING) " +
      s"USING parquet LOCATION '$extData'")
    val e = intercept[IllegalArgumentException] {
      ExactlyOnceSink.foldIntoBucketed(spark, dir, "eo_docs_ext", "doc_id", 8)
    }
    assert(e.getMessage.contains("eo_docs_ext"))
    // the external data is untouched and still served
    assert(spark.table("eo_docs_ext")
      .as[(Long, String)].collect().toSet === Set((9L, "precious")))
    spark.sql("DROP TABLE eo_docs_ext")
  }

  test("swap vs concurrent reader: stale plans fail, re-resolution serves post-fold state") {
    // The CONCURRENT-READER SEAM documented at the fold's swap: a frame
    // resolved BEFORE the fold points at files the swap deletes — its
    // late action must FAIL (never silently serve stale rows from a
    // half-deleted directory), and the documented mitigation
    // (resolve-per-request, the AnswerService pattern) must observe the
    // post-fold state.
    val dir = zone()
    ExactlyOnceSink.landBatch(
      Seq((1L, "v1"), (2L, "v1")).toDF("doc_id", "text"), 0L, dir)
    ExactlyOnceSink.foldIntoBucketed(spark, dir, "eo_docs_swap", "doc_id", 8)
    val stale = spark.table("eo_docs_swap") // resolved pre-swap
    assert(stale.count() === 2)
    ExactlyOnceSink.landBatch(
      Seq((2L, "v2"), (3L, "v1")).toDF("doc_id", "text"), 1L, dir)
    ExactlyOnceSink.foldIntoBucketed(spark, dir, "eo_docs_swap", "doc_id", 8)
    // the stale plan's files are gone (uncached scan): a late action
    // throws rather than serving pre-fold rows
    intercept[Exception] { stale.count() }
    // re-resolving the name — what the serve path does per request —
    // sees exactly the post-fold state
    assert(spark.table("eo_docs_swap")
      .as[(Long, String)].collect().toSet ===
      Set((1L, "v1"), (2L, "v2"), (3L, "v1")))
  }

  test("streaming near-dup verdicts land exactly-once and equal batch mode") {
    // the ingest-pipeline SPLICE: DocsStream.nearDedupStream (stateful
    // dedup) feeds ExactlyOnceSink.attach (idempotent landing) — two
    // micro-batches, then the landing zone's distinct hit set must
    // equal batch mode on the union, and a manual REPLAY of the last
    // batch's rows must leave the zone unchanged.
    val dir = zone()
    val ckpt = Files.createTempDirectory("eo_dedup_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 30L).map(i =>
      i -> (if (i % 5 == 0) "the quick brown fox jumps over dogs"
            else s"word$i token$i stuff$i filler$i pad$i end$i"))
    val in = MemoryStream[(Long, String)]
    val hits = DocsStream.nearDedupStream(in.toDF().toDF("doc_id", "text"))
    val q = ExactlyOnceSink.attach(hits.toDF(), dir, ckpt)
    try {
      in.addData(docs.take(15): _*)
      q.processAllAvailable()
      in.addData(docs.drop(15): _*)
      q.processAllAvailable()
    } finally q.stop()
    def landedHits() = ExactlyOnceSink.landed(spark, dir)
      .select($"doc_id", $"dup_of", $"hamming")
      .as[(Long, Long, Int)].collect().toSet
    val batch = DocsStream.nearDedupStream(docs.toDF("doc_id", "text"))
      .collect().map(h => (h.doc_id, h.dup_of, h.hamming)).toSet
    val first = landedHits()
    assert(first === batch)
    assert(batch.nonEmpty, "fixture must actually produce duplicates")
    // at-least-once: re-land the final micro-batch's rows under its id
    val lastBid = ExactlyOnceSink.landed(spark, dir)
      .agg(org.apache.spark.sql.functions.max($"batch_id")).as[Long].head()
    // materialize the rows first: landBatch would otherwise overwrite
    // the very partition the lazy plan is reading
    val lastRows = ExactlyOnceSink.landed(spark, dir)
      .filter($"batch_id" === lastBid)
      .select($"doc_id", $"dup_of", $"hamming")
      .as[(Long, Long, Int)].collect().toSeq
    ExactlyOnceSink.landBatch(
      lastRows.toDF("doc_id", "dup_of", "hamming"), lastBid, dir)
    assert(landedHits() === batch, "replay must leave the landing zone unchanged")
  }

  test("a real stream lands through foreachBatch and survives a duplicate fold") {
    val dir = zone()
    val ckpt = Files.createTempDirectory("eo_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = ExactlyOnceSink.attach(
      in.toDF().toDF("doc_id", "text"), dir, ckpt)
    try {
      in.addData((10L, "a"), (11L, "b"))
      q.processAllAvailable()
      in.addData((11L, "b2"))
      q.processAllAvailable()
    } finally q.stop()
    ExactlyOnceSink.foldIntoBucketed(spark, dir, "eo_docs_stream", "doc_id", 8)
    val got = spark.table("eo_docs_stream")
      .as[(Long, String)].collect().toSet
    assert(got === Set((10L, "a"), (11L, "b2")))
  }
}

package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.TestSpark.TinySf

/** Spark-side multimodal plumbing: binary payload round trip, metadata
  * pruning shape, batched mapPartitions decode (partition-preserving),
  * and frame-sampling bounds.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("payload is the exact UTF-8 byte round trip of the source text") {
    val row = Multimodal.assets(spark, TinySf)
      .filter($"doc_id" === 0)
      .select(decode($"payload", "UTF-8")).as[String].head()
    val txt = graft.Tables.documents(spark, TinySf)
      .filter($"doc_id" === 0).select($"text").as[String].head()
    assert(row === txt)
  }

  test("stub decode preserves partitioning and feature totals") {
    val a = Multimodal.assets(spark, TinySf).repartition(7)
    val feats = Multimodal.stubDecodeFeatures(a)
    assert(feats.rdd.getNumPartitions === 7)
    // histogram buckets sum to the payload byte count per asset
    val bad = feats
      .join(Multimodal.assets(spark, TinySf)
        .select($"doc_id", $"meta.n_bytes".as("n_bytes")), "doc_id")
      .filter($"f0" + $"f1" + $"f2" + $"f3" =!= $"n_bytes")
    assert(bad.isEmpty)
  }

  test("frame sampling: only video assets, at most maxFrames frames") {
    val frames = Multimodal.sampleFrames(
      Multimodal.assets(spark, TinySf), 64, 4)
    val kinds = frames
      .join(Multimodal.assets(spark, TinySf)
        .select($"doc_id", $"meta.kind".as("kind")), "doc_id")
      .select($"kind").distinct().as[String].collect().toSeq
    assert(kinds === Seq("video"))
    val counts = frames.groupBy($"doc_id").count()
      .agg(max($"count")).as[Long].head()
    assert(counts <= 4)
  }

  test("perceptual near-dup: identical payloads pair at hamming 0; partitioning preserved") {
    // two image-kind assets (doc_id % 3 == 0) with byte-identical
    // payloads MUST share a perceptual hash and surface as a hamming-0
    // pair; a third, byte-disjoint payload must not pair with them
    val rows = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy dog"),
      (6L, "XXXXXXYYYYYYZZZZZZ")).toDF("doc_id", "text")
    val assets = rows.select($"doc_id",
      encode($"text", "UTF-8").as("payload"),
      struct(lit("image").as("kind"),
        octet_length(encode($"text", "UTF-8")).as("n_bytes"),
        lit(1L).as("width"), lit(1L).as("height")).as("meta"))
    val ph = Multimodal.stubPerceptualHash(assets.repartition(5))
    assert(ph.rdd.getNumPartitions === 5)
    val hashes = ph.as[(Long, String)].collect().toMap
    assert(hashes(0L) === hashes(3L),
      "identical payloads must hash identically")
    assert(hashes.values.forall(h => h.length == 16 &&
      h.forall(c => c == '0' || c == '1')))
    // determinism: a second pass produces the same hashes
    assert(Multimodal.stubPerceptualHash(assets)
      .as[(Long, String)].collect().toMap === hashes)
  }
}

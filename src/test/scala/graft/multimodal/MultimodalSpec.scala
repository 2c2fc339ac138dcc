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
    assert(hashes.values.forall(h => h.length == 64 &&
      h.forall(c => c == '0' || c == '1')))
    // determinism: a second pass produces the same hashes
    assert(Multimodal.stubPerceptualHash(assets)
      .as[(Long, String)].collect().toMap === hashes)
  }

  /** The round-15 widening claim (round-14 verdict item 4), measured: at
    * an image-corpus-scale fixture the OLD 16-bit/2×8-bit scheme's band
    * keyspace (256 values) saturates — (nearly) every bucket exceeds
    * MaxBucket, the capped join drops the candidates, and recall over
    * planted duplicate pairs collapses — while the shipped 64-bit/4×16
    * scheme keeps buckets under the cap and, by pigeonhole (<= 3
    * mismatches cannot touch all 4 bands), finds every planted pair.
    */
  test("64-bit/4-band phash keeps recall at a corpus size where 8-bit bands saturate") {
    import org.apache.spark.sql.{Row => SRow}
    import org.apache.spark.sql.types._
    val n = 30000
    val planted = 50 // duplicate pairs: (i, n + i) share payload bytes
    val rows = spark.sparkContext.parallelize(0 until n + planted, 32)
      .map { i =>
        val src = if (i >= n) i - n else i // duplicates of the first 50
        val rnd = new scala.util.Random(src * 2654435761L)
        val payload = new Array[Byte](64)
        rnd.nextBytes(payload)
        SRow(i.toLong, payload)
      }
    val assets = spark.createDataFrame(rows, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType))))
    val ph = Multimodal.stubPerceptualHash(assets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cap = graft.dedup.Dedup.MaxBucket
    def pairsFound(bands: Int, width: Int): Set[(Long, Long)] = {
      val banded = ph.select($"doc_id", $"phash",
        posexplode(array((0 until bands).map(b =>
          substring($"phash", b * width + 1, width)): _*))
          .as(Seq("band", "bits")))
      val ok = banded.groupBy($"band", $"bits")
        .agg(count(lit(1)).as("bsz")).filter($"bsz" <= cap)
        .select($"band", $"bits")
      banded.join(ok, Seq("band", "bits")).as("a")
        .join(banded.join(ok, Seq("band", "bits")).as("b"),
          $"a.band" === $"b.band" && $"a.bits" === $"b.bits" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id", $"b.doc_id").distinct()
        .as[(Long, Long)].collect().toSet
    }
    val plantedPairs =
      (0 until planted).map(i => (i.toLong, (n + i).toLong)).toSet
    // the old shape: the first 16 bits in 2×8-bit bands — 256-value
    // keyspace, 30k images → buckets blow the cap and candidates vanish
    val old16 = pairsFound(2, 8) // over substring(phash,1,16) via width 8
    val oldRecall = plantedPairs.count { case (a, b) =>
      old16.contains((a, b)) } / planted.toDouble
    // the shipped shape: 4×16-bit bands over the full 64 bits
    val new64 = pairsFound(4, 16)
    assert(plantedPairs.subsetOf(new64),
      "4×16-bit banding must surface every planted duplicate pair")
    assert(oldRecall <= 0.2,
      s"8-bit bands should saturate at n=$n (recall read $oldRecall)")
    // and the saturation mechanism is the cap itself: most rows live in
    // over-cap 8-bit-band buckets
    val overCap = ph.select($"doc_id",
        posexplode(array(substring($"phash", 1, 8),
          substring($"phash", 9, 8))).as(Seq("band", "bits")))
      .groupBy($"band", $"bits").agg(count(lit(1)).as("bsz"))
      .filter($"bsz" > cap).agg(sum($"bsz")).as[Long].head()
    assert(overCap > 2L * (n + planted) * 9 / 10,
      "at this corpus size ~all 8-bit-band rows must exceed the cap")
    ph.unpersist(blocking = false)
  }
}

package graft.similarity

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The runtime SemDeDup probe knobs (round-13 verdict item 5):
  * `spark.graft.semdedup.{lo,hi,margin}` must (a) default to the shipped
  * design point so every oracle gate and committed number is unchanged —
  * pinned here as bit-for-bit equality between the unset session and an
  * explicitly-set 4/6/0.1 session — and (b) actually steer the probe
  * ladder, pinned on the cross-cell fixture where a single-cell probe
  * provably misses the near-dup pair and a forced two-cell probe
  * provably catches it (the deterministic unit case of the recall/work
  * trade the knobs exist to tune).
  */
class SemDedupConfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // the SemanticDedupNprobeSpec cross-cell fixture: pair (7, 57) at
  // cos ≈ 0.95 whose members live in DIFFERENT primary cells
  private def fixtureDir(): String = {
    import spark.implicits._
    val e1 = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val e2 = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val a = Seq(0.3f, 0.1f, 0.0f, 0.945f)
    val b = Seq(0.1f, 0.3f, 0.0f, 0.945f)
    val rows: Seq[(Long, Seq[Float])] =
      (0L until 100L).map {
        case 7L  => 7L -> a
        case 57L => 57L -> b
        case i if i < 50 => i -> e1
        case i           => i -> e2
      }
    val d = Files.createTempDirectory("semdedup_conf_fix").toString
    rows.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "embedding", "CAST(0 AS INT) AS label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def withKnobs[A](lo: Option[String], hi: Option[String],
      margin: Option[String])(body: => A): A = {
    val knobs = Seq(Similarity.SemLoConf -> lo, Similarity.SemHiConf -> hi,
      Similarity.SemMarginConf -> margin)
    try {
      knobs.foreach { case (k, v) => v.foreach(spark.conf.set(k, _)) }
      body
    } finally knobs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  private def q152(d: String): Seq[(Long, Long)] = {
    import spark.implicits._
    graft.SparkEntry.queries("q152_semantic_dedup_boundary")(spark, d)
      .as[(Long, Long)].collect().toSeq
  }

  test("default confs reproduce the unset q152 bit-for-bit") {
    val d = "/root/testdata/sf0.001"
    val unset = q152(d)
    val explicit = withKnobs(Some("4"), Some("6"), Some("0.1"))(q152(d))
    assert(explicit === unset && unset.nonEmpty,
      "explicitly setting the shipped defaults must be a no-op")
  }

  test("the knobs steer the probe ladder: lo=hi=1 misses the cross-cell pair, a forced 2-cell probe catches it") {
    val d = fixtureDir()
    // single-cell probe ≡ nprobe=1: different primary cells → both kept
    val np1 = withKnobs(Some("1"), Some("1"), Some("0"))(q152(d)).toMap
    assert(np1(7L) === 1L && np1(57L) === 1L,
      "lo=hi=1 must behave like nprobe=1 and keep both halves")
    // margin 2.0 covers the whole signed-cos² key range → every vector
    // probes both cells (≡ nprobe=2): pair caught, higher id dropped
    val np2 = withKnobs(Some("1"), Some("2"), Some("2.0"))(q152(d)).toMap
    assert(np2(7L) === 1L && np2(57L) === 0L,
      "a forced 2-cell probe must catch the cross-cell pair")
    assert(np1.keySet === np2.keySet && np1.size === 100)
  }

  test("out-of-range knobs fail loudly, naming the confs") {
    val d = "/root/testdata/sf0.001"
    val e = intercept[IllegalArgumentException] {
      withKnobs(Some("3"), Some("2"), Some("0.1"))(q152(d))
    }
    assert(e.getMessage.contains(Similarity.SemLoConf))
  }
}

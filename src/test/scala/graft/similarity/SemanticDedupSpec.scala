package graft.similarity

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q133 SemDeDup-shape semantic dedup on a hand-built fixture small
  * enough that k-means degenerates to ONE cell (n < 50 ⟹ the 50-floor
  * modulus seeds only vec_id 0), so the keep/drop rule is tested in
  * isolation: within a cell, a vector is dropped iff a LOWER-id
  * cell-mate sits at cos ≥ 1/√8 ≈ 0.3536.
  */
class SemanticDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fixtureDir(rows: Seq[(Long, Seq[Float])]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("semdedup_fix").toString
    rows.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "embedding", "CAST(0 AS INT) AS label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("drops higher-id near-duplicates, keeps sub-threshold and anchor vectors") {
    import spark.implicits._
    val d = fixtureDir(Seq(
      0L -> Seq(1.0f, 0.0f),   // anchor (lowest id — always kept)
      1L -> Seq(0.5f, 0.0f),   // cos(v0)=1           -> dropped
      2L -> Seq(0.0f, 1.0f),   // orthogonal to all   -> kept
      3L -> Seq(1.0f, 1.0f),   // cos(v0)=0.707 ≥ τ   -> dropped
      4L -> Seq(1.0f, 3.0f),   // max cos = cos(v3)=0.894 ≥ τ -> dropped
      5L -> Seq(-1.0f, 0.3f))) // negative dot vs v0/v1; cos(v2)=0.287 < τ -> kept
    val got = graft.SparkEntry.queries("q133_semantic_dedup")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    // one cell (only seed is vec_id 0), so cid is the same for all rows
    assert(got.map(_._2).distinct.size === 1)
    assert(got.map(r => r._1 -> r._3) ===
      Seq(0L -> 1L, 1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 0L, 5L -> 1L))
  }

  test("threshold boundary: cos just under 1/sqrt(8) survives") {
    import spark.implicits._
    // cos((1,0),(1,3)) = 1/√10 ≈ 0.316 < 1/√8 — kept;
    // cos((1,0),(3,1)) = 3/√10 ≈ 0.949 ≥ τ — dropped
    val d = fixtureDir(Seq(
      0L -> Seq(1.0f, 0.0f),
      1L -> Seq(1.0f, 3.0f),
      2L -> Seq(3.0f, 1.0f)))
    val got = graft.SparkEntry.queries("q133_semantic_dedup")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(r => r._1 -> r._3) === Seq(0L -> 1L, 1L -> 1L, 2L -> 0L))
  }
}

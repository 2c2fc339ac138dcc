package graft.similarity

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q136 vs q133 on a fixture engineered to hold a CROSS-CELL near-dup
  * pair: 100 vectors seed two cells (vec_id % 50 = 0 → anchors 0 and
  * 50, ≈ e1 and e2), cells are kept stable under the two Lloyd rounds
  * by clone fillers, and the pair (7, 57) lives mostly along e4 with
  * small opposite e1/e2 leans — so each member's PRIMARY cell differs
  * (cos ≈ 0.32 to its own anchor, under the 0.354 bar) while the pair
  * itself sits at cos ≈ 0.95. nprobe=1 must MISS it (both kept);
  * nprobe=2 assigns both vectors to both cells and must CATCH it
  * (higher id dropped). This is the measured 0.38→0.69 recall gap of
  * PERF.md reduced to a deterministic unit case.
  */
class SemanticDedupNprobeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fixtureDir(): String = {
    import spark.implicits._
    val e1 = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val e2 = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val a = Seq(0.3f, 0.1f, 0.0f, 0.945f)  // primary cell: anchor e1
    val b = Seq(0.1f, 0.3f, 0.0f, 0.945f)  // primary cell: anchor e2
    val rows: Seq[(Long, Seq[Float])] =
      (0L until 100L).map {
        case 7L  => 7L -> a
        case 57L => 57L -> b
        case i if i < 50 => i -> e1  // cell-A clones keep centroid ≈ e1
        case i           => i -> e2  // cell-B clones keep centroid ≈ e2
      }
    val d = Files.createTempDirectory("semdedup_np_fix").toString
    rows.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "embedding", "CAST(0 AS INT) AS label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("the cross-cell pair is missed at nprobe=1 and caught at nprobe=2") {
    import spark.implicits._
    val d = fixtureDir()
    val np1 = graft.SparkEntry.queries("q133_semantic_dedup")(spark, d)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val np2 = graft.SparkEntry.queries("q136_semantic_dedup_nprobe2")(spark, d)
      .as[(Long, Long)].collect().toMap
    // nprobe=1: different primary cells, each under its own anchor's bar
    assert(np1(7L) === 1L && np1(57L) === 1L,
      "nprobe=1 must keep both halves of the cross-cell pair")
    // nprobe=2: shared second cell surfaces the pair; lower id survives
    assert(np2(7L) === 1L, "lower id of the caught pair must survive")
    assert(np2(57L) === 0L, "nprobe=2 must drop the higher id")
    // sanity: the keep universe is identical (every vec_id, both queries)
    assert(np1.keySet === np2.keySet && np1.size === 100)
  }

  /** Five stable cells (anchors e1..e5 over 6 dims, 50 clones each,
    * n=250 → seeds at vec_id % 50 = 0) and a near-dup pair (7, 107) at
    * cos ≈ 0.92 engineered so the members' TOP-2 cell sets are disjoint
    * — u leans (0.30, 0.20, 0.10) on anchors (A, B, C), v leans
    * (0.30, 0.20, 0.10) on (C, D, A) — while cell C (u's rank 3, v's
    * rank 1) is shared only from rank 3 on. Every anchor lean is under
    * the 0.354 bar, so no clone drops either member; only the pair
    * itself can. nprobe=2 must MISS it; nprobe=4 (q139) must CATCH it —
    * the cross-cell case the new recall point (0.69 → 0.98 at sf0.01)
    * newly covers.
    */
  private def rank3FixtureDir(): String = {
    import spark.implicits._
    def axis(i: Int): Seq[Float] =
      (0 until 6).map(j => if (j == i) 1.0f else 0.0f)
    val u = Seq(0.30f, 0.20f, 0.10f, 0.0f, 0.0f, 0.927f)
    val v = Seq(0.10f, 0.0f, 0.30f, 0.20f, 0.0f, 0.927f)
    val rows: Seq[(Long, Seq[Float])] =
      (0L until 250L).map {
        case 7L   => 7L -> u
        case 107L => 107L -> v
        case i    => i -> axis((i / 50L).toInt)
      }
    val d = Files.createTempDirectory("semdedup_np4_fix").toString
    rows.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "embedding", "CAST(0 AS INT) AS label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("the rank-3 boundary pair is missed at nprobe=2 and caught at nprobe=4") {
    import spark.implicits._
    val d = rank3FixtureDir()
    val np2 = graft.SparkEntry.queries("q136_semantic_dedup_nprobe2")(spark, d)
      .as[(Long, Long)].collect().toMap
    val np4 = graft.SparkEntry.queries("q139_semantic_dedup_nprobe4")(spark, d)
      .as[(Long, Long)].collect().toMap
    // nprobe=2: top-2 cells {A,B} vs {C,D} are disjoint — pair invisible
    assert(np2(7L) === 1L && np2(107L) === 1L,
      "nprobe=2 must keep both halves of the rank-3 boundary pair")
    // nprobe=4: shared cells C (and A) surface the pair; lower id wins
    assert(np4(7L) === 1L, "lower id of the caught pair must survive")
    assert(np4(107L) === 0L, "nprobe=4 must drop the higher id")
    assert(np2.keySet === np4.keySet && np2.size === 250)
  }
}

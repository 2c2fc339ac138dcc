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
}

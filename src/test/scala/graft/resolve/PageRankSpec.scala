package graft.resolve

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** PageRank invariants (no SQL oracle — float fixpoint): coverage of all
  * vertices, positive ranks, isolated vertices at the reset probability,
  * and higher rank for a hub than for a leaf.
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ranks cover all vertices; hub outranks leaves; isolated = reset prob") {
    // star: 0 is the hub of 1,2,3; 9 is isolated.
    val verts = Seq(0L, 1L, 2L, 3L, 9L).toDF("vec_id")
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("u", "v")
    val ranks = EntityResolution.pageRank(spark, verts, pairs, iters = 20)
      .as[(Long, Double)].collect().toMap
    assert(ranks.keySet === Set(0L, 1L, 2L, 3L, 9L))
    assert(ranks.values.forall(_ > 0))
    // hub > symmetric leaves > isolated (which holds only reset mass;
    // GraphX normalizes final ranks, so no absolute value assertions)
    assert(ranks(0L) > ranks(1L))
    assert(ranks(1L) > ranks(9L))
    assert(ranks(1L) === ranks(2L) && ranks(2L) === ranks(3L))
  }
}

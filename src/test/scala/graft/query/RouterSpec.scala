package graft.query

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.TestSpark.TinySf

/** L1 routing: family dispatch equals the direct template calls; family
  * 17 lists the catalog; empty primary results fall back to text search.
  */
class RouterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("family dispatch matches direct template invocation") {
    val routed = Router.route(spark, TinySf, 10, Map("keyword" -> "vector"))
      .as[(Long, Long)].collect().toSeq
    val direct = graft.graph.GraphQueries.keywordPerYear(spark, TinySf, "vector")
      .as[(Long, Long)].collect().toSeq
    assert(routed === direct && routed.nonEmpty)
  }

  test("family 13 with hops param dispatches to Pregel reachability") {
    val out = Router.route(spark, TinySf, 13,
      Map("author" -> "Author_29", "hops" -> "2"))
    assert(out.columns.toSeq === Seq("author", "hops"))
    assert(out.count() > 6) // beyond the direct co-author set
  }

  test("family 17 returns the 17-row capability catalog") {
    assert(Router.route(spark, TinySf, 17, Map.empty).count() === 17)
  }

  test("missing parameter raises a descriptive error") {
    val e = intercept[IllegalArgumentException] {
      Router.route(spark, TinySf, 1, Map.empty)
    }
    assert(e.getMessage.contains("title"))
  }

  test("empty graph result falls back to full-text search (L2)") {
    val out = Router.withFallback(spark, TinySf, 1,
      Map("title" -> "NO_SUCH_DOC"), Seq("merge", "window"))
    // fallback returns (title, topics_csv) rows, not the empty authors frame
    assert(out.columns.toSeq === Seq("title", "topics_csv"))
    assert(out.count() > 0)
  }
}

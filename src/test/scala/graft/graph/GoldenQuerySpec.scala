package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.TestSpark.TinySf

/** Golden Q.txt workload (SURVEY.md §5 item 4): exact expected rows for
  * representative families on the sf0.001 fixture, pinned from
  * oracle-verified output — regression safety independent of the DuckDB
  * gate.
  */
class GoldenQuerySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("family 1: authors of D42") {
    assert(GraphQueries.docAuthors(spark, TinySf, "D42")
      .as[String].collect().toSeq === Seq("Author_29"))
  }

  test("family 4: topic of D100 (taxonomy join + paren strip)") {
    assert(GraphQueries.docTopic(spark, TinySf, "D100")
      .as[(String, String)].collect().toSeq === Seq(("D100", "生物医药与诊断技术")))
  }

  test("family 10 flagship: per-year counts for alias-expanded 'vector'") {
    val rows = GraphQueries.keywordPerYear(spark, TinySf, "vector")
      .as[(Long, Long)].collect().toSeq
    assert(rows.size === 25)
    assert(rows.take(4) === Seq((2000L, 20L), (2001L, 20L), (2002L, 18L), (2003L, 19L)))
    assert(rows.map(_._2).sum === 464L)
  }

  test("family 11: Author_29 wrote D42 (AUTHORED), not D43") {
    assert(GraphQueries.authoredCheck(spark, TinySf, "Author_29", Seq("D42", "D43"))
      .as[(String, String)].collect().toSeq === Seq(("D42", "AUTHORED")))
  }

  test("family 13: co-authors of Author_29") {
    assert(GraphQueries.coauthors(spark, TinySf, "Author_29")
      .as[String].collect().toSeq ===
      Seq("Author_12", "Author_16", "Author_46", "Author_62", "Author_71", "Author_95"))
  }

  test("family 14: top co-occurring keywords with 'small'") {
    val rows = GraphQueries.keywordCooccur(spark, TinySf, "small", 10)
      .as[(String, Long)].collect().toSeq
    assert(rows.head === ("window", 325L))
    assert(rows.size === 10)
  }

  test("alias edges: exactly the four non-identity mappings") {
    assert(BibGraph.aliasEdges(spark, TinySf)
      .select($"src", $"dst").as[(String, String)].collect().toSet ===
      Set(("group", "batch"), ("query", "column"),
        ("spark", "customer"), ("vector", "merge")))
  }
}

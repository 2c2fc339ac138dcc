package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** P4-P6/P8 parity with `utils.py:7-43,90-97` and the S9 statement shape. */
class CypherRenderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("escapeCypherString doubles backslashes and escapes quotes") {
    assert(CypherRender.escapeCypherString("""a\b'c""") === """a\\b\'c""")
  }

  test("normalizePropKey lowercases, underscores, backticks non-identifiers") {
    assert(CypherRender.normalizePropKey("Reference Type") === "reference_type")
    assert(CypherRender.normalizePropKey("ISBN/ISSN") === "`isbn/issn`")
    assert(CypherRender.normalizePropKey("Sub-Title") === "sub_title")
    assert(CypherRender.normalizePropKey("1st") === "`1st`")
  }

  test("formatCypherProperties: numbers raw, strings quoted, lists bracketed, nulls dropped") {
    val out = CypherRender.formatCypherProperties(Seq(
      "Year" -> 2022, "Title" -> "it's", "Keywords" -> Seq("a", "b"),
      "Nothing" -> null))
    assert(out === """{year: 2022, title: 'it\'s', keywords: ['a', 'b']}""")
  }

  test("formatListProperty doubles quotes, brackets, empty-for-empty") {
    assert(CypherRender.formatListProperty(Seq("a", "b\"c")) === """[a,b""c]""")
    assert(CypherRender.formatListProperty(Nil) === "")
  }

  test("mergeStatements renders deduplicated MERGE rows with escaping") {
    val docs = Seq(("T'1", "Patent"), ("T'1", "Patent"), ("T2", "Thesis"))
      .toDF("title", "label")
    val stmts = CypherRender.mergeStatements(docs).as[String].collect().toSet
    assert(stmts === Set(
      """MERGE (p:Patent {title: 'T\'1'})""",
      """MERGE (p:Thesis {title: 'T2'})"""))
  }
}

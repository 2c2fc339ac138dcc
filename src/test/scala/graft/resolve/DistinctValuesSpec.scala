package graft.resolve

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** A2: distinct non-empty value extraction across scalar and array
  * columns (`keyword_merger.py:150-163`).
  */
class DistinctValuesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unions scalars and exploded arrays, drops null/empty, dedups") {
    val df = Seq(
      ("p1", Seq("k1", "k2"), "pub1"),
      ("p2", Seq("k2", ""), null),
      ("p3", Seq.empty[String], "pub1")
    ).toDF("id", "keywords", "publisher")
    val vals = EntityResolution.distinctValues(df, Seq("keywords", "publisher"))
      .as[String].collect().toSet
    assert(vals === Set("k1", "k2", "pub1"))
  }
}

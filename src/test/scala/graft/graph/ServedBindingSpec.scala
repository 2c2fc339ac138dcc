package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The staleness guard of the build-once/serve-many bindings: requesting
  * the SAME prefix for a DIFFERENT source dir must rebuild, not serve
  * the previous corpus's tables (the failure mode would be silent wrong
  * results in any process touching two fixtures — every test JVM, and a
  * Bench/Verify pair pointed at different SFs).
  */
class ServedBindingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Content fingerprint of a binding's docs table — the two fixture
    * dirs hold the same ROW COUNT (500 docs each) and the same derived
    * titles (D<doc_id>), so staleness is only detectable through a
    * genuinely per-fixture column (the abstract = source text).
    */
  private def fp(g: DocGraph): Long = {
    import org.apache.spark.sql.functions._
    g.docs.agg(sum(crc32(col("abstract"))).cast("long")).head.getLong(0)
  }

  test("bucketedServed rebuilds when the same prefix points at a new source dir") {
    val d1 = TestSpark.TinySf
    val g1 = DocGraph.bucketedServed(spark, d1, "graft_served_spec", 8)
    val fp1 = fp(g1)
    assert(g1.docs.count() > 0)
    // second call, same dir: serves (content identical)
    assert(fp(DocGraph.bucketedServed(spark, d1, "graft_served_spec", 8)) === fp1)
    // same prefix, different source: must NOT serve d1's tables
    val d2 = "/root/testdata/sf0.01"
    val fp2 = fp(DocGraph.bucketedServed(spark, d2, "graft_served_spec", 8))
    assert(fp2 !== fp1,
      "identical docs fingerprint after switching source dirs — stale serve?")
    // and switching BACK also rebuilds (the guard is last-dir, not a set)
    assert(fp(DocGraph.bucketedServed(spark, d1, "graft_served_spec", 8)) === fp1)
  }
}

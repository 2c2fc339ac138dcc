package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Plan-shape gates for the q130–q132 sampling family: the whole point
  * of deterministic hash sampling is that it is a narrow map — these
  * specs pin the shuffle budget so a regression (e.g. an accidental
  * repartition or a window picking up a second key) shows up as a test
  * failure, not a 100 TB surprise.
  */
class SamplingPlanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Plan with AQE off: the adaptive wrapper hides the exchange nodes
    * from a static collect (same approach as `BucketedDocGraphSpec`).
    */
  private def exchanges(build: => DataFrame): Seq[ShuffleExchangeExec] = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try build.queryExecution.executedPlan
      .collect { case e: ShuffleExchangeExec => e }
    finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("q130 hash sample is a pure narrow map: only the presentation sort shuffles") {
    val ex = exchanges(
      graft.SparkEntry.queries("q130_hash_sample")(spark, dir))
    // exactly one exchange, and it is the orderBy's range partitioning —
    // no hash exchange anywhere (no groupBy/join/window snuck in)
    assert(ex.size === 1, s"expected 1 exchange (sort), got ${ex.size}")
    assert(ex.head.outputPartitioning.toString.contains("range"),
      s"sole exchange should be the sort, was ${ex.head.outputPartitioning}")
  }

  test("q131 stratified sample shuffles once on the stratum key plus the sort") {
    val ex = exchanges(
      graft.SparkEntry.queries("q131_stratified_sample")(spark, dir))
    assert(ex.size === 2, s"expected stratum hash + sort, got ${ex.size}")
    val hashes = ex.filterNot(_.outputPartitioning.toString.contains("range"))
    assert(hashes.size === 1, "exactly one hash exchange (the stratum window)")
    assert(hashes.head.outputPartitioning.toString.contains("source"),
      "the hash exchange must key on the stratum column")
  }

  test("q132 domain mix shuffles once on the domain key plus the sort") {
    val ex = exchanges(
      graft.SparkEntry.queries("q132_domain_mix")(spark, dir))
    assert(ex.size === 2, s"expected domain hash + sort, got ${ex.size}")
    val hashes = ex.filterNot(_.outputPartitioning.toString.contains("range"))
    assert(hashes.size === 1, "exactly one hash exchange (the domain window)")
    assert(hashes.head.outputPartitioning.toString.contains("source"),
      "the hash exchange must key on the domain column")
  }
}

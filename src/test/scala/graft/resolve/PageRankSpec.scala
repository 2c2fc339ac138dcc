package graft.resolve

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Exact scaled-integer PageRank: structural invariants hold EXACTLY
  * (no float tolerance), and — the property that closed q54's oracle gap
  * — results are identical under different partitionings, because every
  * operation is integer arithmetic with a deterministic truncating
  * division. The value-level gate is q54's DuckDB hash oracle.
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hub outranks leaves; isolated vertex holds exactly the reset mass") {
    // star: 0 is the hub of 1,2,3; 9 is isolated.
    val verts = Seq(0L, 1L, 2L, 3L, 9L).toDF("vec_id")
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("u", "v")
    val ranks = EntityResolution.pageRank(spark, verts, pairs, iters = 20)
      .as[(Long, Long)].collect().toMap
    assert(ranks.keySet === Set(0L, 1L, 2L, 3L, 9L))
    assert(ranks.values.forall(_ > 0))
    assert(ranks(0L) > ranks(1L))
    assert(ranks(1L) > ranks(9L))
    // symmetric leaves agree EXACTLY — integer arithmetic, no ulp jitter
    assert(ranks(1L) === ranks(2L) && ranks(2L) === ranks(3L))
    // isolated vertex receives no messages: rank = 0.15 * S exactly
    assert(ranks(9L) === EntityResolution.PrScale * 15 / 100)
  }

  test("ranks are identical under different partitionings") {
    val verts = Seq.range(0L, 40L).toDF("vec_id")
    val pairs = Seq.tabulate(60)(i =>
      ((i * 7 % 40).toLong, (i * 13 % 40).toLong))
      .filter { case (u, v) => u != v }.toDF("u", "v")
    def run(parts: Int): Map[Long, Long] =
      EntityResolution.pageRank(spark, verts.repartition(parts),
        pairs.repartition(parts), iters = 10)
        .as[(Long, Long)].collect().toMap
    val a = run(1)
    val b = run(7)
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("reliable-checkpoint variant returns identical ranks") {
    // fault-tolerance path: lineage cut with a RELIABLE checkpoint (HDFS
    // in production, temp dir here) instead of the removed executor-local
    // localCheckpoint — values must be bit-identical
    val dir = java.nio.file.Files.createTempDirectory("graft-pr-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    val verts = Seq.range(0L, 30L).toDF("vec_id")
    val pairs = Seq.tabulate(45)(i =>
      ((i * 11 % 30).toLong, (i * 17 % 30).toLong))
      .filter { case (u, v) => u != v }.toDF("u", "v")
    val base = EntityResolution.pageRank(spark, verts, pairs, iters = 9)
      .as[(Long, Long)].collect().toMap
    val ckpt = EntityResolution.pageRank(spark, verts, pairs, iters = 9,
      checkpointEvery = 3).as[(Long, Long)].collect().toMap
    assert(base === ckpt)
  }

  test("the full iteration materializes in a handful of jobs, not per-round") {
    // scheduling-regression pin: the r5-weak DataFrame formulation paid a
    // localCheckpoint job every 3rd round; the RDD loop schedules all
    // rounds inside the single materializing count (plus at most AQE's
    // stage jobs for the count agg itself)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val verts = Seq.range(0L, 40L).toDF("vec_id")
      val pairs = Seq.tabulate(60)(i =>
        ((i * 7 % 40).toLong, (i * 13 % 40).toLong))
        .filter { case (u, v) => u != v }.toDF("u", "v")
      EntityResolution.pageRank(spark, verts, pairs, iters = 10)
      // listener bus is async; give it a moment to drain
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (jobs.get() == 0 && System.nanoTime() < deadline) Thread.sleep(50)
      Thread.sleep(500)
      // budget: vertex-count sizing job + the materializing count. The
      // exact count is scheduler-dependent (AQE / a Spark upgrade may
      // legitimately stage the count agg as extra jobs), so the pin is
      // deliberately loose — the property that matters is "far below the
      // ~14 jobs of the r5-weak per-round-checkpointing formulation",
      // i.e. all 10 rounds schedule inside one materializing action.
      assert(jobs.get() > 0 && jobs.get() <= 8,
        s"expected <=8 jobs for a 10-round pageRank, saw ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}

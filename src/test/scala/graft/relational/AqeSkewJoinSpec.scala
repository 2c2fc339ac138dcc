package graft.relational

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** AQE skew-join handling — the runtime complement to q13's MANUAL
  * salting (SURVEY §2.5 skew note): a pathologically skewed equi-join is
  * split by AQE's OptimizeSkewedJoin at runtime, no salting column, no
  * rewritten query. The spec pins (a) that the split actually happens
  * under this engine's session shape (the skew-split shuffle read is in
  * the executed plan), and (b) that results are byte-identical to the
  * static plan — so at 100 TB a hot key (the reference corpus' giant
  * `Other_Article` label family, a hot user in events) degrades into
  * extra parallel tasks instead of one straggler executor.
  *
  * The thresholds are scaled down to fixture size; production keeps the
  * defaults (256 MB partitions) — the knobs scale, the mechanism is
  * identical.
  */
class AqeSkewJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def withSkewConfs[A](f: => A): A = {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** 100k-row left side with ~90% of rows on one hot key; unique-keyed
    * right side (so expected output size is exact and cheap to compute).
    */
  private def frames = {
    import spark.implicits._
    val left = spark.range(0, 100000).select(
      when($"id" % 10 =!= 0, lit(7L)).otherwise($"id" % 1000).as("k"),
      $"id".as("v"))
    val right = spark.range(0, 1000).select(
      $"id".as("k"), concat(lit("r"), $"id").as("tag"))
    (left, right)
  }

  test("a hot key is split into parallel skew tasks at runtime") {
    withSkewConfs {
      val (left, right) = frames
      val joined = left.join(right, "k")
      // execute THIS dataframe: .count() would plan (and adaptively
      // execute) a different query tree, leaving joined's own adaptive
      // plan un-finalized
      val n = joined.collect().length
      assert(n === 100000) // every left row matches exactly one right row
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true"),
        s"expected a skew-split join in the final adaptive plan:\n$plan")
      assert(plan.contains("AQEShuffleRead skewed"),
        s"expected the skew-split shuffle read in the plan:\n$plan")
    }
  }

  test("skew-split results equal the static plan's") {
    import spark.implicits._
    val expected = withSkewConfs {
      val (left, right) = frames
      left.join(right, "k").agg(
        count(lit(1)), sum($"v"), min($"tag"), max($"tag")).collect().toSeq
    }
    // static run: AQE off entirely
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (left, right) = frames
      val got = left.join(right, "k").agg(
        count(lit(1)), sum($"v"), min($"tag"), max($"tag")).collect().toSeq
      assert(got === expected)
    } finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}

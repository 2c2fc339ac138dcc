package graft.resolve

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only pricing of the REAL-INGEST multi-day CRUD lifecycle (q161's
  * `ingestedMultidayCrudServed`) at term universes the 7-term fixture
  * cannot exercise (round-13 verdict item 6: the lifecycle's scale claim
  * rested on composition of audited kernels, not a measurement):
  * `Test/runMain graft.resolve.ProfileTaggedLifecycle [n ...]`.
  *
  * Per-day cost comes from the lifecycle's own `onPhase` hook — one
  * replay reports day-0 build and each day's kernel+advance wall time
  * directly. (A first cut differenced whole replays of increasing ops
  * prefixes; the repeated day-0 build's ±5 s variance swamped the day
  * costs — negative "day" readings at n=100k — so the instrument moved
  * inside the replay.) Each config runs twice; pass 2 is the warm
  * reading. Terms are synthetic (`t$i`) but flow through the PRODUCTION
  * keyword→id→embedding columns (the ProfileTaggedServe discipline), so
  * the kernels see the q161 geometry exactly: θ=24/25, classes =
  * vec_id % 3 (each day's batch ≈ a third of the universe).
  *
  * Caveat stated in the q159/q161 scaladocs and visible here: the first
  * day's phase carries the full-universe parse/embed (the fixture-
  * convenience `filter(isNew)` AFTER `embedTermUniverse`), so "insert1"
  * is an upper bound on the deployment's batch-scoped serve.
  *
  * The scale claim under test: each day's cost tracks the DAY'S BATCH,
  * not the corpus — checked two ways: (a) day costs at n=30k vs n=100k
  * with the same class rule (batch grows ~3.3×, day cost should track);
  * (b) at fixed n, the insert day under cls=%3 (~33% batch) vs cls=%10
  * (~10% batch) — a corpus-bound day would read flat across (b).
  */
object ProfileTaggedLifecycle {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(30000, 100000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val allOps = Seq(("insert", 1), ("update", 2), ("delete", 0))
    sizes.foreach { n =>
      val universe = spark.range(n.toLong)
        .select(concat(lit("t"), $"id").as("keywords"))
      def replay(cls: Int, tag: String): Unit = {
        val phases = scala.collection.mutable.LinkedHashMap[String, Double]()
        val t0 = System.nanoTime()
        EntityResolution.ingestedMultidayCrudServed(spark,
          () => universe, sourceKey = s"profile_n$n", num = 24, den = 25,
          prefix = s"graft_prof_lc_${n}_$tag",
          cls = c => c % cls, ops = allOps,
          onPhase = (t, s) => phases(t) = s)
          .write.format("noop").mode("overwrite").save()
        val total = (System.nanoTime() - t0) / 1e9
        EntityResolution.releaseServeCaches()
        val parts = phases.map { case (k, v) => f"$k=$v%.2f" }.mkString(" ")
        println(f"[profile] n=$n $tag $parts total=$total%.2f")
      }
      println(s"== n=$n ==")
      (1 to 2).foreach { pass =>
        replay(3, s"pass${pass}_cls3")
        replay(10, s"pass${pass}_cls10")
      }
    }
    spark.stop()
  }
}

package graft.resolve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only pricing of the REAL-INGEST multi-day CRUD lifecycle (q161's
  * `ingestedMultidayCrudServed` and its merge-on-read twin q165) at term
  * universes the 7-term fixture cannot exercise:
  * `Test/runMain graft.resolve.ProfileTaggedLifecycle [n ...]`.
  *
  * Round-15 shape (verdict items 1/5/7): each size runs a 2×2 cell —
  * {merge-on-write, merge-on-read} × {full-universe parse, BATCH-SCOPED
  * `daySource`} — twice. The scoped mode writes the universe as a
  * class-partitioned parquet directory (the deployment's arriving-batch
  * layout) and each day's thunk reads ONLY its `cls=k` partition
  * (partition-pruned scan), so the per-day parse cost is the batch; the
  * full mode filters the whole-universe parse per day (the fixture-gate
  * convenience). Pass 1 builds the day-0 snapshot (the per-JVM+source
  * `_base_*` tables); pass 2 is the steady-state replay — reset + three
  * days — which is what the registry's serve medians now measure.
  *
  * Per-day cost comes from the lifecycle's own `onPhase` hook (the MOW
  * path; MOR reports replay totals — its day kernels are identical, only
  * the advance differs). Terms are synthetic (`t$i`) but flow through
  * the PRODUCTION keyword→id→embedding columns (the ProfileTaggedServe
  * discipline), so the kernels see the q161 geometry exactly: θ=24/25,
  * classes = vec_id % 3 (each day's batch ≈ a third of the universe).
  *
  * Claims under test: (a) with `daySource`, each day's phase cost tracks
  * the DAY'S BATCH — the full-universe parse term visible in the
  * unscoped insert1 phase disappears; (b) the q161-vs-q165 (MOW-vs-MOR)
  * advance comparison at a 30k-term REAL-INGEST universe, which the
  * 7-term fixture reads as neutral by construction (round-14 item 7).
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
      // the deployment's batch layout: one directory per class, so a
      // day's thunk reads its partition alone (pruned at the scan) —
      // written once per size, outside the timed replays
      val dir = java.nio.file.Files
        .createTempDirectory(s"prof_lc_batches_$n").toString
      universe.select($"keywords",
          (conv(substring(md5($"keywords"), 1, 15), 16, 10).cast("long")
            % 3).as("cls"))
        .write.mode("overwrite").partitionBy("cls").parquet(dir)
      val scopedSource: Int => DataFrame = k =>
        spark.read.parquet(dir).filter($"cls" === k).select($"keywords")
      def replay(variant: String, scoped: Boolean, pass: Int): Unit = {
        val tag = s"${variant}_${if (scoped) "scoped" else "full"}"
        val phases = scala.collection.mutable.LinkedHashMap[String, Double]()
        val src = if (scoped) Some(scopedSource) else None
        val t0 = System.nanoTime()
        val out = variant match {
          case "mow" => EntityResolution.ingestedMultidayCrudServed(spark,
            () => universe, sourceKey = s"profile_n$n", num = 24, den = 25,
            prefix = s"graft_prof_lc_${n}_$tag",
            ops = allOps, onPhase = (t, s) => phases(t) = s,
            daySource = src)
          case "mor" => EntityResolution.ingestedMultidayCrudServedMor(spark,
            () => universe, sourceKey = s"profile_n$n", num = 24, den = 25,
            prefix = s"graft_prof_lc_${n}_$tag",
            ops = allOps, daySource = src)
        }
        out.write.format("noop").mode("overwrite").save()
        val total = (System.nanoTime() - t0) / 1e9
        EntityResolution.releaseServeCaches()
        val parts = phases.map { case (k, v) => f"$k=$v%.2f" }.mkString(" ")
        println(f"[profile] n=$n pass$pass $tag $parts total=$total%.2f")
      }
      println(s"== n=$n ==")
      (1 to 2).foreach { pass =>
        replay("mow", scoped = false, pass)
        replay("mow", scoped = true, pass)
        replay("mor", scoped = false, pass)
        replay("mor", scoped = true, pass)
      }
    }
    spark.stop()
  }
}

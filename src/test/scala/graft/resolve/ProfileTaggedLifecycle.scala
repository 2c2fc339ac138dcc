package graft.resolve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only pricing of the REAL-INGEST multi-day CRUD lifecycle (q161's
  * `ingestedMultidayCrudServed`) at term universes the 7-term fixture
  * cannot exercise (round-13 verdict item 6: the lifecycle's scale claim
  * rested on composition of audited kernels, not a measurement):
  * `Test/runMain graft.resolve.ProfileTaggedLifecycle [n ...]`.
  *
  * Methodology: the lifecycle replays from a fresh day-0 build each
  * call, so per-day cost is measured by DIFFERENCING replays of
  * increasing ops prefixes — +insert, +update, +delete — against a
  * BUILD-ONLY baseline whose ingest thunk is pre-scoped to the
  * pre-insert subset (ops = [] derives day-0 membership from the empty
  * inserted set, so handing it the full universe would build a LARGER
  * day 0 than the insert runs see and corrupt the difference). Each
  * ladder runs twice; pass 2 is the warm reading (pass 1 carries
  * first-touch costs). Terms are synthetic (`t$i`) but flow through the
  * PRODUCTION keyword→id→embedding columns (the ProfileTaggedServe
  * discipline), so the kernels see the q161 geometry exactly: θ=24/25,
  * classes = vec_id % 3 (each day's batch ≈ a third of the universe).
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
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val allOps = Seq(("insert", 1), ("update", 2), ("delete", 0))
    sizes.foreach { n =>
      val universe = spark.range(n.toLong)
        .select(concat(lit("t"), $"id").as("keywords"))
      // class of a keyword under the production md5-derived id
      val idCls = conv(substring(md5($"keywords"), 1, 15), 16, 10)
        .cast("long")
      def replay(ingested: () => DataFrame, ops: Seq[(String, Int)],
          cls: Int, tag: String): Double = {
        val t = time {
          EntityResolution.ingestedMultidayCrudServed(spark,
            ingested, sourceKey = s"profile_n$n", num = 24, den = 25,
            prefix = s"graft_prof_lc_${n}_$tag",
            cls = c => c % cls, ops = ops)
            .write.format("noop").mode("overwrite").save()
        }
        EntityResolution.releaseServeCaches()
        t
      }
      println(s"== n=$n ==")
      (1 to 2).foreach { pass =>
        // build-only baseline over the PRE-INSERT subset (see scaladoc)
        val preIns3 = () => universe.filter(idCls % 3 =!= 1)
        val all = () => universe
        val b = replay(preIns3, Nil, 3, "b")
        val i = replay(all, allOps.take(1), 3, "i")
        val u = replay(all, allOps.take(2), 3, "u")
        val f = replay(all, allOps, 3, "f")
        println(f"[profile] n=$n pass$pass cls=%%3 day0=$b%.2f " +
          f"+insert=${i - b}%.2f +update=${u - i}%.2f " +
          f"+delete=${f - u}%.2f full=$f%.2f")
        // batch-proportionality probe: same corpus, ~10% batch
        val preIns10 = () => universe.filter(idCls % 10 =!= 1)
        val b10 = replay(preIns10, Nil, 10, "b10")
        val i10 = replay(all, Seq(("insert", 1)), 10, "i10")
        println(f"[profile] n=$n pass$pass cls=%%10 day0=$b10%.2f " +
          f"+insert=${i10 - b10}%.2f")
      }
    }
    spark.stop()
  }
}

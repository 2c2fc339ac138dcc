package graft.resolve

import org.apache.spark.sql.SparkSession

/** Dev-only pricing of the q163 merge-on-read story's third act:
  * `Test/runMain graft.resolve.ProfileMorCompaction [sfDir]`.
  *
  * The MOR advance defers the corpus write from every update/delete day
  * to a compaction SCHEDULE — so the complete cost comparison is
  *   q162 (merge-on-write): N days × (kernels + corpus rewrites)
  *   q163 (merge-on-read):  N days × (kernels + batch appends)
  *                          + one `compactMor` per schedule period.
  * The replay costs are benched (bench/r14_sf10_mor_focused.json); this
  * profiles the missing term: compactMor over the pair and assigned
  * stores right after a q163 replay (sidecars at their three-day depth),
  * plus a post-compaction replay to show reads return to the plain
  * bucketed base (next replay drops sidecars either way; the value of
  * compaction is read-side bucketing, priced in the q163-vs-q162 gap at
  * low sidecar depth).
  */
object ProfileMorCompaction {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/bench_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", (8L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // first call builds the base snapshot (untimed here), second is the
    // steady-state replay the bench records
    EntityResolution.multidayCrudResolveServedMor(spark, d)
      .write.format("noop").mode("overwrite").save()
    EntityResolution.releaseServeCaches()
    time("q163 replay (warm)") {
      EntityResolution.multidayCrudResolveServedMor(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    EntityResolution.releaseServeCaches()
    // sidecars now hold the three-day depth: price the scheduled fold.
    // NOTE this folds the advanced state INTO the base tables — correct
    // for a deployment (the corpus genuinely advanced) but it retires
    // this JVM's replay fixture: the snapshot no longer holds day-0
    // state, so no further q163 calls after this point. A fresh JVM
    // rebuilds the base from the source (writeBucketed drops the old).
    time("compactMor pairs store") {
      graft.graph.BucketedStore.compactMor(spark,
        "graft_q163_base_pairs", "u", Seq("u", "v"))
    }
    time("compactMor assigned store") {
      graft.graph.BucketedStore.compactMor(spark,
        "graft_q163_base_assigned", "cid", Seq("vec_id"))
    }
    spark.stop()
  }
}

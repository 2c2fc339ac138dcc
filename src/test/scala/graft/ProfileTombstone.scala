package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: measure the tombstone-serve adjudication inputs and both
  * path costs on a bench fixture:
  * `Test/runMain graft.ProfileTombstone [sfDir]`.
  *
  * Prints, for the dense (q150) and sparse (q153) predicates: standing
  * rows, dirty-component row fraction, stored-pair count and the
  * fraction of pairs with a dirty-component endpoint, then times the
  * dirty-component split vs the force-recompute path from the same
  * stored tables (two runs each, same JVM).
  */
object ProfileTombstone {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/bench_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", (8L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"[profile] $n: ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    // build the standing tables once via the serve path (dense predicate,
    // threshold 1.1 = always split, so the build is identical either way)
    time("first serve call (build + split)") {
      resolve.EntityResolution.tombstoneResolveServed(spark, d,
        prefix = "graft_prof", dirtyFractionFallback = 1.1).count()
    }
    val mapping = spark.table("graft_prof_mapping")
    val pairs = spark.table("graft_prof_pairs")
    val nPairs = pairs.count()
    Seq(
      ("dense  vec%10=5", (c: org.apache.spark.sql.Column) => c % 10 === 5),
      ("sparse (vec%10M)%200=5",
        (c: org.apache.spark.sql.Column) => c % 10000000L % 200 === 5)
    ).foreach { case (tag, isDel) =>
      val delReps = mapping.filter(isDel($"vec_id"))
        .select($"component").distinct().cache()
      val st = mapping
        .join(delReps.withColumn("dd", lit(1)), Seq("component"), "left")
        .agg(count(lit(1)), count($"dd")).as[(Long, Long)].head()
      val dirtyPairs = pairs
        .join(mapping.select($"vec_id".as("u"), $"component"), Seq("u"))
        .join(delReps, Seq("component"), "left_semi").count()
      println(s"[profile] $tag: rows=${st._1} dirtyRows=${st._2} " +
        f"rowFrac=${st._2.toDouble / st._1}%.3f pairs=$nPairs " +
        f"dirtyPairs=$dirtyPairs pairFrac=${dirtyPairs.toDouble / nPairs}%.3f")
      // the two CC inputs, exactly as each path builds them
      val dirtySurv = mapping.join(delReps, "component")
        .filter(!isDel($"vec_id")).select($"vec_id")
      val splitPairs = pairs
        .join(dirtySurv.withColumnRenamed("vec_id", "u"), Seq("u"), "left_semi")
        .join(dirtySurv.withColumnRenamed("vec_id", "v"), Seq("v"), "left_semi")
      val allSurv = mapping.filter(!isDel($"vec_id")).select($"vec_id")
      val forcePairs = pairs
        .join(allSurv.withColumnRenamed("vec_id", "u"), Seq("u"), "left_semi")
        .join(allSurv.withColumnRenamed("vec_id", "v"), Seq("v"), "left_semi")
      println(s"[profile] $tag CC inputs: split=(${dirtySurv.count()} v, " +
        s"${splitPairs.count()} e) force=(${allSurv.count()} v, " +
        s"${forcePairs.count()} e)")
      // superstep hypothesis: CC over the CLEAN components alone — if
      // this small graph costs like the force-split delta, the force
      // path's extra cost is Pregel rounds bound by the cleanest
      // components' diameter, which the split's passthrough never pays
      val cleanVerts = mapping.join(delReps, Seq("component"), "left_anti")
        .select($"vec_id")
      val cleanPairs = pairs
        .join(cleanVerts.withColumnRenamed("vec_id", "u"), Seq("u"), "left_semi")
        .join(cleanVerts.withColumnRenamed("vec_id", "v"), Seq("v"), "left_semi")
      println(s"[profile] $tag clean graph: ${cleanVerts.count()} v, " +
        s"${cleanPairs.count()} e")
      time(s"$tag CC(clean only)") {
        resolve.EntityResolution.connectedComponents(
          spark, cleanVerts, cleanPairs).count()
      }
      delReps.unpersist()
      def clean(): Unit = {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      (1 to 2).foreach { i =>
        time(s"$tag split   run$i") {
          resolve.EntityResolution.tombstoneResolveServed(spark, d,
            prefix = "graft_prof", isDel = isDel,
            dirtyFractionFallback = 1.1).count()
        }
        clean()
        time(s"$tag force   run$i") {
          resolve.EntityResolution.tombstoneResolveServed(spark, d,
            prefix = "graft_prof", isDel = isDel,
            dirtyFractionFallback = 0.0).count()
        }
        clean()
      }
    }
    spark.stop()
  }
}

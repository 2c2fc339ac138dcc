package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiler for any registry query:
  * `Test/runMain graft.ProfileQuery <query> [sfDir] [reps] [--explain]`.
  * Prints wall time per rep (first rep carries JVM/codegen warmup) and
  * optionally the formatted physical plan.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val (flags, positional) = args.partition(_.startsWith("--"))
    val name = positional.headOption.getOrElse(
      sys.error("usage: ProfileQuery <query> [sfDir] [reps] [--explain] [--save=dir]"))
    val d = positional.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = positional.lift(2).map(_.toInt).getOrElse(2)
    val explain = flags.contains("--explain")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
    if (explain) q(spark, d).explain("formatted")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = q(spark, d).count()
      println(s"[profile] $name rep$i: ${(System.nanoTime() - t0) / 1e9}s rows=$n")
    }
    args.find(_.startsWith("--save=")).map(_.stripPrefix("--save=")).foreach {
      out => q(spark, d).coalesce(1).write.mode("overwrite").parquet(out)
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (sessions are expensive;
  * ScalaTest suites run sequentially in the forked JVM).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** sf0.001 fixture dir — the smallest scale, for cheap integration tests. */
  val TinySf = "/root/testdata/sf0.001"
}

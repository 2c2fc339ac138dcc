package graft.graph

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed storage for the graph frames — the write-time layout that
  * makes the multi-hop self-joins co-located at 100 TB (PERF.md: "bucket
  * the edge frames by the document key and the 2/3-hop self-joins
  * co-locate"). Two tables bucketed+sorted on the same key with the same
  * bucket count join with NO shuffle exchange (verified by
  * `BucketedStoreSpec`); at cluster scale this removes the dominant
  * shuffle of every co-author / co-occurrence / collaborator query.
  *
  * Uses the session catalog (`saveAsTable` — bucketing metadata lives in
  * the metastore; a plain `.parquet(path)` write cannot record it).
  */
object BucketedStore {

  /** Write `df` bucketed+sorted by `key` into the session catalog.
    *
    * Overwrite replaces a CATALOGED table's location, but the in-memory
    * session catalog forgets tables across JVMs while their managed
    * warehouse directories persist on disk — the next process's write
    * then fails LOCATION_ALREADY_EXISTS. Drop any stale catalog entry and
    * clear the orphaned managed location first, so the write is
    * idempotent across runs (a metastore-backed cluster never orphans;
    * this is the local-catalog equivalent).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 16): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(s: SparkSession, name: String): DataFrame = s.table(name)

  /** Hive-style partitioned layout — the OTHER write-time pruning lever:
    * one directory per `keys` value combination, so an equality filter on
    * a partition column is resolved from directory listings and the scan
    * never opens non-matching files (`PartitionFilters` in the plan,
    * verified with a read-path assertion in `BucketedStoreSpec`). At
    * 100 TB this is what turns "the train split of the zh corpus" from a
    * full scan into a directory walk. Partition columns must be
    * low-cardinality (split, lang, date...) — high-cardinality keys
    * belong in bucketing, not partitioning (small-files explosion).
    */
  def writePartitioned(df: DataFrame, path: String, keys: String*): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(keys: _*)
      .parquet(path)
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.graph.BucketedStore

/** The production LANDING path for a document stream: exactly-once
  * delivery into the lakehouse on top of Structured Streaming's
  * at-least-once `foreachBatch` replay.
  *
  * Layering (each half is idempotent on its own, so their composition
  * is exactly-once end-to-end with no transaction coordinator):
  *
  *  1. [[landBatch]] — per-micro-batch write into a `batch_id=<id>`
  *     partition with DYNAMIC partition overwrite. A replayed batch
  *     (failure before the checkpoint advanced) rewrites ITS OWN
  *     partition and touches nothing else; since a replayable source
  *     re-delivers the same rows for the same batchId (the Structured
  *     Streaming contract), the landing zone converges to one copy of
  *     every batch no matter how many times delivery repeats. This is
  *     the idempotence rule the Spark docs prescribe for foreachBatch —
  *     keyed by batchId — expressed as a layout.
  *  2. [[foldIntoBucketed]] — the maintenance job that turns the landed
  *     batches into the serving layout: a PURE function of the landing
  *     zone (latest batch wins per key) written via the
  *     [[BucketedStore.writeBucketed]] drop-and-rewrite. Re-running it
  *     — after a crash, after a replay, twice in a row — produces the
  *     identical table because its input, not its history, defines the
  *     output. No marker files, no commit log to lose.
  *
  * At 100 TB the fold stays proportional to the landing zone it reads;
  * batches already represented in the bucketed table can be pruned from
  * the zone AFTER a successful fold (retention, not correctness — the
  * fold never needs markers to stay exactly-once). A transactional
  * table format would collapse the two layers into one commit; this is
  * the same guarantee from plain parquet + deterministic derivation.
  */
object ExactlyOnceSink {

  /** Idempotently land one micro-batch: rewrite exactly the
    * `batch_id=<batchId>` partition of `dir` (dynamic partition
    * overwrite — sibling partitions are untouched, unlike static
    * overwrite which would truncate the zone).
    */
  def landBatch(batch: DataFrame, batchId: Long, dir: String): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(dir)

  /** The landed zone as a frame (batch_id is a partition column). */
  def landed(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir)

  /** Wire a streaming frame into the landing zone via foreachBatch. */
  def attach(stream: DataFrame, dir: String,
             checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((df: DataFrame, id: Long) => landBatch(df, id, dir))
      .start()

  /** Derive the bucketed serving table from the landing zone: one row
    * per `key`, the row from the HIGHEST batch_id winning (ties within
    * a batch broken by the largest remaining column tuple — determinism
    * over arrival order, which a distributed read does not preserve).
    * Pure + swap-written ⇒ idempotent: fold-after-replay and
    * fold-twice both leave the table byte-identical in content.
    */
  def foldIntoBucketed(s: SparkSession, dir: String, table: String,
                       key: String, buckets: Int = 16): Unit = {
    import org.apache.spark.sql.expressions.Window
    val z = landed(s, dir)
    val others = z.columns.filterNot(c => c == key || c == "batch_id")
    val w = Window.partitionBy(col(key))
      .orderBy(col("batch_id").desc +: others.map(col(_).desc): _*)
    val latest = z.withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .drop("graft_rn", "batch_id")
    BucketedStore.writeBucketed(latest, table, key, buckets)
  }
}

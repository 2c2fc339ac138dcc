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
  *     batches into the serving layout: a deterministic latest-wins
  *     merge of (existing table as the base layer, landing zone on
  *     top), swap-written. Re-running it — after a crash, after a
  *     replay, twice in a row — produces the identical table because
  *     its inputs, not its history, define the output. No marker
  *     files, no commit log to lose.
  *
  * At 100 TB the fold's zone side stays proportional to the unpruned
  * batches; [[pruneLanded]] drops batches already folded into the base
  * (safe because the fold layers over the base — pruned history
  * survives there). A transactional table format would collapse the
  * two layers into one commit; this is the same guarantee from plain
  * parquet + deterministic derivation.
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

  /** Retention for the landing zone: drop `batch_id=<id>` partitions
    * with id ≤ `throughBatchId` — call AFTER a successful fold whose
    * input included those batches (their content now lives in the
    * folded table, which [[foldIntoBucketed]] layers under later zone
    * rows, so pruned history is never lost to a re-fold). A replay of
    * a pruned batch would simply rewrite its partition; Structured
    * Streaming replays only batches after the last checkpoint, which a
    * successful fold postdates, so in the wired pipeline pruned batches
    * are never re-delivered — and even if one were, fold idempotence
    * absorbs it.
    */
  def pruneLanded(s: SparkSession, dir: String, throughBatchId: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(root)) return
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("batch_id=")) {
        val id = scala.util.Try(name.stripPrefix("batch_id=").toLong)
        if (id.toOption.exists(_ <= throughBatchId))
          fs.delete(st.getPath, true)
      }
    }
  }

  /** Fold the landing zone into the bucketed serving table: one row per
    * `key`, the row from the HIGHEST batch_id winning, with the
    * EXISTING table as the lowest-precedence base layer (batch_id −1).
    * Layering over the base is what makes [[pruneLanded]] safe: a row
    * whose only zone occurrence was in a since-pruned batch survives in
    * the base, so fold∘prune∘fold converges instead of losing it.
    * Idempotent on content: re-folding the same zone changes nothing
    * (zone rows tie-break over identical base rows), so fold-after-
    * replay and fold-twice are no-ops. Ties within a batch break by the
    * largest remaining column tuple — determinism over arrival order,
    * which a distributed read does not preserve.
    *
    * Write discipline: the merged result is FULLY written to a temp
    * table first, then swapped via catalog drop+rename (the
    * `compactBucketed` pattern) — never an in-place overwrite of the
    * base table the plan is reading.
    */
  def foldIntoBucketed(s: SparkSession, dir: String, table: String,
                       key: String, buckets: Int = 16): Unit = {
    import org.apache.spark.sql.expressions.Window
    // a fully-pruned (or never-landed) zone folds to a no-op: the base
    // table already IS the state, and parquet cannot even infer a
    // schema from a partition-less directory
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    val hasBatches = fs.exists(root) &&
      fs.listStatus(root).exists(_.getPath.getName.startsWith("batch_id="))
    if (!hasBatches) return
    val z = landed(s, dir)
    val merged =
      if (s.catalog.tableExists(table))
        s.table(table).withColumn("batch_id", lit(-1L))
          .unionByName(z.select(z.columns.map(col(_)): _*))
      else z
    val others = merged.columns.filterNot(c => c == key || c == "batch_id")
    val w = Window.partitionBy(col(key))
      .orderBy(col("batch_id").desc +: others.map(col(_).desc): _*)
    val latest = merged.withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .drop("graft_rn", "batch_id")
    val tmp = table + "_fold"
    BucketedStore.writeBucketed(latest, tmp, key, buckets)
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    s.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
  }
}

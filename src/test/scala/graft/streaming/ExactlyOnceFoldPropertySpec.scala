package graft.streaming

import java.nio.file.Files
import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Model-based check of the exactly-once landing/fold/prune lifecycle:
  * a random interleaving of land / REPLAY (re-land an already-landed
  * batch id — the at-least-once delivery mode) / fold / prune-folded is
  * mirrored by a trivially-auditable in-memory reference (map of key →
  * latest-batch row, base-layered), and the bucketed serving table must
  * match it after every fold. Catches lifecycle edge cases the hand
  * fixtures don't enumerate: replay-after-prune-window interleavings,
  * fold-with-empty-zone mid-sequence, keys that only ever existed in a
  * pruned batch surviving through the base layer.
  */
class ExactlyOnceFoldPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("random land/replay/fold/prune sequences: table == in-memory reference") {
    import spark.implicits._
    Seq(11L, 99L).foreach { seed =>
      val rnd = new Random(seed)
      val dir = Files.createTempDirectory(s"eoprop$seed").toString + "/zone"
      val table = s"eo_prop_$seed"
      spark.sql(s"DROP TABLE IF EXISTS `$table`")

      // reference state
      var zone = Map.empty[Long, Seq[(Long, String)]] // batchId -> rows
      var folded = Map.empty[Long, String]            // key -> text
      var lastFolded = -1L

      def batchRows(bid: Long): Seq[(Long, String)] = {
        // deterministic per (seed, bid): replays re-deliver THE SAME rows
        val r = new Random(seed * 1000 + bid)
        val keys = r.shuffle((0L until 10L).toList).take(1 + r.nextInt(4))
        keys.map(k => (k, s"b$bid-k$k-${r.nextInt(100)}"))
      }
      def land(bid: Long): Unit = {
        val rows = batchRows(bid)
        ExactlyOnceSink.landBatch(rows.toDF("doc_id", "text"), bid, dir)
        zone += bid -> rows
      }

      var nextBatch = 0L
      var folds = 0
      (1 to 40).foreach { _ =>
        rnd.nextInt(5) match {
          case 0 | 1 => // land a new batch
            land(nextBatch); nextBatch += 1
          case 2 if zone.nonEmpty => // at-least-once replay
            land(zone.keys.toSeq(rnd.nextInt(zone.size)))
          case 3 => // fold: zone over base, highest batch wins per key
            ExactlyOnceSink.foldIntoBucketed(spark, dir, table, "doc_id", 8)
            if (zone.nonEmpty) {
              val zoneLatest = zone.toSeq
                .flatMap { case (bid, rows) => rows.map { case (k, v) => (k, bid, v) } }
                .groupBy(_._1)
                .map { case (k, rs) => k -> rs.maxBy(_._2)._3 }
              folded = folded ++ zoneLatest
              lastFolded = math.max(lastFolded, zone.keys.max)
              folds += 1
            }
          case _ => // prune everything already folded
            ExactlyOnceSink.pruneLanded(spark, dir, lastFolded)
            zone = zone.filter { case (bid, _) => bid > lastFolded }
        }
        if (folds > 0) {
          val got = spark.table(table).as[(Long, String)].collect().toMap
          assert(got === folded, s"table diverged at seed $seed")
        }
      }
      // final fold + check (covers sequences ending on land/prune)
      ExactlyOnceSink.foldIntoBucketed(spark, dir, table, "doc_id", 8)
      if (zone.nonEmpty) {
        val zoneLatest = zone.toSeq
          .flatMap { case (bid, rows) => rows.map { case (k, v) => (k, bid, v) } }
          .groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2)._3 }
        folded = folded ++ zoneLatest
      }
      if (folded.nonEmpty) {
        val got = spark.table(table).as[(Long, String)].collect().toMap
        assert(got === folded, s"final table diverged at seed $seed")
      }
    }
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: IVF recall@k of the approximate top-k queries against
  * the exact q40 baseline, under the current sizing/assignment config —
  * the number that prices the two-level quantizer's level-1 routing
  * error and the spacing knob's blocking trade. Mirrors Bench's env
  * contract (`SPARK_GRAFT_SF_DIR`, `SPARK_GRAFT_IVF_SPACING`) plus
  * `SPARK_GRAFT_IVF_HIER_THRESHOLD` to force the two-level path.
  */
object RecallStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_IVF_SPACING")
      .foreach(v => builder.config(graft.similarity.Similarity.SpacingConf, v))
    sys.env.get("SPARK_GRAFT_IVF_HIER_THRESHOLD")
      .foreach(v =>
        builder.config(graft.similarity.Similarity.HierThresholdConf, v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def topSets(q: String, k: Int): Map[Long, Set[Long]] =
      graft.SparkEntry.queries(q)(spark, sfDir)
        .select("qid", "rank", "nid").collect()
        .filter(_.getLong(1) <= k)
        .groupBy(_.getLong(0))
        .map { case (qid, rows) => qid -> rows.map(_.getLong(2)).toSet }
    val exact = topSets("q40_ann_bruteforce_topk", 3)
    for (approx <- Seq("q42_ivf_topk", "q43_ivf_topk_nprobe2")) {
      val got = topSets(approx, 3)
      val recalls = exact.toSeq.map { case (qid, want) =>
        got.getOrElse(qid, Set.empty).intersect(want).size.toDouble / want.size
      }
      println(f"$approx recall@3 = ${recalls.sum / recalls.size}%.3f " +
        f"over ${recalls.size} queries")
    }
    spark.stop()
  }
}

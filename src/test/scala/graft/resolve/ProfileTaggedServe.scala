package graft.resolve

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B for the q157/q158 serve-path candidate kernels at term
  * universes the 7-term fixture cannot exercise:
  * `Test/runMain graft.resolve.ProfileTaggedServe [n ...]`.
  *
  * OLD shape (pre-r13): `epsPairsOf(survivors ∪ batch)` + batch-endpoint
  * post-filter — the exact all-pairs kernel over the FULL universe, with
  * a universe-sized driver collect, per serve call.
  * NEW shape (r13): `epsPairsAgainst(survivors, batch)` (batch broadcast,
  * survivors stream) ∪ `epsPairsOf(batch)` — compares and collect sized
  * by the batch. Both are counted AND equated per n (the equivalence the
  * fixture spec pins, re-checked at scale).
  *
  * Terms are synthetic (`t$i`) but flow through the PRODUCTION id +
  * embedding columns (md5-derived vec_id, termEmbedding stub), so the
  * kernels see exactly the q157 geometry: θ=24/25, isUpd = id%3=1
  * (~1/3 of the universe re-embedded by reversal).
  */
object ProfileTaggedServe {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(30000, 100000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val isUpd = (c: org.apache.spark.sql.Column) => c % 3 === 1
    sizes.foreach { n =>
      val terms = spark.range(n)
        .select(concat(lit("t"), $"id").as("term"))
        .select($"term",
          conv(substring(md5($"term"), 1, 15), 16, 10).cast("long")
            .as("vec_id"),
          EntityResolution.termEmbedding($"term").as("embedding"))
        .persist()
      terms.count()
      val survivors = terms.filter(!isUpd($"vec_id"))
      val batch = terms.filter(isUpd($"vec_id"))
        .withColumn("embedding", reverse($"embedding"))
      val nb = batch.count()
      println(s"== n=$n batch=$nb ==")
      var oldCnt = -1L
      var newCnt = -1L
      (1 to 2).foreach { pass =>
        oldCnt = time(s"n=$n pass$pass OLD epsPairsOf(union)+filter") {
          EntityResolution
            .epsPairsOf(survivors.unionByName(batch), 24, 25)
            .filter(isUpd($"u") || isUpd($"v")).count()
        }
        newCnt = time(s"n=$n pass$pass NEW against+batch") {
          EntityResolution.epsPairsAgainst(survivors, batch, 24, 25)
            .unionByName(EntityResolution.epsPairsOf(batch, 24, 25))
            .count()
        }
      }
      println(s"n=$n old=$oldCnt new=$newCnt equal=${oldCnt == newCnt}")
      terms.unpersist(blocking = false)
    }
    spark.stop()
  }
}

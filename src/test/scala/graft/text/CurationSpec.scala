package graft.text

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Curation operators on a hand-built fixture exercising the branches
  * the driver fixtures never hit (every fixture doc has ≥ 10 tokens):
  * sub-3-token docs produce NO shingles (trivially kept, never
  * contaminating) and packing rolls to a new sequence exactly when the
  * cumulative token count crosses the budget.
  */
class CurationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fixtureDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("curation_fix").toString
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'zh' AS lang", "'test' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("decontamination: short docs make and match no shingles") {
    import spark.implicits._
    val d = fixtureDir(Seq(
      100L -> "a b c d", // eval doc: shingles {a b c, b c d}
      200L -> "x y",     // eval doc with NO shingles (under 3 tokens)
      1L -> "a b c e",   // collides on "a b c" -> dropped
      2L -> "p q",       // no shingles -> trivially kept
      3L -> "m n o"))    // shingle, no collision -> kept
    val got = graft.SparkEntry.queries("q125_decontaminate")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L, 0L), (2L, 0L, 1L), (3L, 0L, 1L)))
  }

  test("packing: sequence id rolls when the 512-token budget is crossed") {
    import spark.implicits._
    def toks(n: Int): String = Seq.fill(n)("t").mkString(" ")
    // doc_ids 32/64/96 share shard 0; starts at 0, 300, 600 tokens
    val d = fixtureDir(Seq(
      32L -> toks(300), 64L -> toks(300), 96L -> toks(300),
      33L -> toks(600))) // shard 1: a single over-budget doc starts seq 0
    val got = graft.SparkEntry.queries("q126_pack_sequences")(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (32L, 0L, 300L, 0L),  // start 0   -> seq 0
      (33L, 1L, 600L, 0L),  // start 0   -> seq 0 (spans past the budget)
      (64L, 0L, 300L, 0L),  // start 300 -> seq 0
      (96L, 0L, 300L, 1L))) // start 600 -> seq 1
  }
}

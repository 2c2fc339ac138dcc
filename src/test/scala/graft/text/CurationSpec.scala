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

  /** The q130–q132 sampling hash, restated independently in the test. */
  private def h(id: Long): Long = (id * 2654435761L) % 4294967296L

  private def sourcedDir(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("curation_fix").toString
    rows.toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'zh' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("hash sample: keeps exactly the ids whose Knuth hash HIGH bits land on 0 mod 10") {
    import spark.implicits._
    val d = fixtureDir((0L until 100L).map(i => i -> "a b c"))
    val got = graft.SparkEntry.queries("q130_hash_sample")(spark, d)
      .as[(Long, String, Long)].collect().toSeq
    val want = (0L until 100L).filter(i => (h(i) >> 22) % 10 == 0)
      .map(i => (i, "test", 3L))
    assert(got === want)
    assert(got.nonEmpty) // the constants actually select something
    // Regression for the parity bias the low-bit rule had: because
    // h ≡ doc_id (mod 2), `h % 10 == 0` could only ever keep even ids.
    // The high-bit rule must sample both parities.
    assert(got.map(_._1 % 2).toSet === Set(0L, 1L))
  }

  test("stratified sample: exact ceil(n/5) per stratum, hash-ranked") {
    import spark.implicits._
    // stratum A: 6 docs -> keep ceil(6/5) = 2; stratum B: 1 doc -> keep 1
    val aIds = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val d = sourcedDir(aIds.map(i => (i, "x y", "A")) :+ ((100L, "x", "B")))
    val got = graft.SparkEntry.queries("q131_stratified_sample")(spark, d)
      .as[(Long, String, Long)].collect().toSeq
    val wantA = aIds.sortBy(i => (h(i), i)).take(2)
    assert(got.filter(_._2 == "A").map(_._1).sorted === wantA.sorted)
    assert(got.filter(_._2 == "B") === Seq((100L, "B", 1L)))
    // ranks are the hash-order positions 1..2 within A
    assert(got.filter(_._2 == "A").map(_._3).sorted === Seq(1L, 2L))
  }

  test("novelty: first-occurrence shingles score 1000, repeats 0, short docs absent") {
    import spark.implicits._
    val d = fixtureDir(Seq(
      1L -> "a b c d",   // shingles {a b c, b c d} — both first here -> 1000
      2L -> "a b c d",   // same shingles, later id -> 0
      3L -> "a b c x y", // {a b c, b c x, c x y}: 2 of 3 novel -> 666
      4L -> "p q"))      // no shingles -> no row
    val got = graft.SparkEntry.queries("q134_novelty_permille")(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 2L, 1000L), (2L, 2L, 0L, 0L), (3L, 3L, 2L, 666L)))
  }

  test("tfidf: rare terms outrank frequent ones; ties break lexicographically") {
    import spark.implicits._
    // "z" df=1 (score 1e6), "a" df=3 (score 333333/occurrence)
    val d = fixtureDir(Seq(
      1L -> "a a z",  // z: 1e6; a: 2*333333=666666
      2L -> "a b",    // b df=2 -> 5e5; a 333333
      3L -> "a b"))
    val got = graft.SparkEntry.queries("q135_tfidf_topk")(spark, d)
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, "z", 1000000L), (1L, 2L, "a", 666666L),
      (2L, 1L, "b", 500000L), (2L, 2L, "a", 333333L),
      (3L, 1L, "b", 500000L), (3L, 2L, "a", 333333L)))
  }

  test("domain mix: admits docs in hash order until the start offset hits the budget") {
    import spark.implicits._
    def toks(n: Int): String = Seq.fill(n)("t").mkString(" ")
    // source "test" (weight 1) -> budget 800 tokens; 3 docs of 300:
    // hash-order starts are 0, 300, 600 -> all < 800 admitted... so use
    // 4 docs of 300: the 4th start (900) crosses and is cut.
    val ids = Seq(10L, 11L, 12L, 13L)
    val d = fixtureDir(ids.map(i => i -> toks(300)))
    val got = graft.SparkEntry.queries("q132_domain_mix")(spark, d)
      .as[(Long, String, Long, Long)].collect().toSeq
    val order = ids.sortBy(i => (h(i), i))
    val want = order.zipWithIndex.collect {
      case (i, k) if k * 300L < 800L => (i, "test", 300L, k * 300L)
    }.sortBy(_._1)
    assert(got === want)
    assert(got.size === 3)
  }
}

package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5 item 3): aggregator ≡
  * sequential first-seen dedup under arbitrary partitioning, label
  * sanitization shape, CSV round-trip with hostile strings, mapping
  * idempotence. ScalaCheck generators driven directly (the
  * scalatest-scalacheck bridge is not in the offline cache) with fixed
  * seeds for reproducibility.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val word: Gen[String] =
    Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("知识图谱", "量子,通信", "a\"b", "x'y", "含 空格"))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("FirstSeenDedup merge order never changes the result") {
    val cases = samples(Gen.zip(Gen.listOf(word), Gen.chooseNum(1, 5)), 100)
    assert(cases.size === 100)
    cases.foreach { case (vs, cut) =>
      val indexed = vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }
      val expected = indexed.foldLeft(Vector.empty[String])((acc, p) =>
        if (acc.contains(p._1)) acc else acc :+ p._1)
      // split into chunks, reduce each, merge in reverse order —
      // simulates arbitrary partition assignment + merge order.
      val chunks = indexed.grouped(math.max(1, cut)).toList
      val bufs = chunks.map(_.foldLeft(graft.functions.FirstSeenDedup.zero)(
        graft.functions.FirstSeenDedup.reduce))
      val merged = bufs.reverse.foldLeft(graft.functions.FirstSeenDedup.zero)(
        graft.functions.FirstSeenDedup.merge)
      assert(graft.functions.FirstSeenDedup.finish(merged) === expected)
    }
  }

  test("StripPostal scan ≡ the reference lookaround regex pipeline") {
    // the fused single-pass kernel (r17, verdict item 4) must be
    // byte-identical to the three-pass regex form it replaced:
    //   trim(collapse(replace(lookaround-pattern, " ")))
    // over strings mixing ASCII digits/ws, letters, CJK, and the
    // dialect-boundary characters (full-width digit １, ideographic
    // space U+3000 — non-\s, non-[0-9] in Java regex, so both sides
    // must treat them as ordinary text)
    val look = java.util.regex.Pattern.compile(
      "(?:(?<=[^0-9])|(?<=^))\\s*[0-9]{6}\\s*(?=[^0-9]|$)")
    val ws = java.util.regex.Pattern.compile("\\s+")
    def reference(s: String): String =
      ws.matcher(look.matcher(s).replaceAll(" ")).replaceAll(" ").trim
    val piece: Gen[String] = Gen.oneOf(
      Gen.numStr.map(_.take(8)),
      Gen.alphaStr.map(_.take(4)),
      Gen.oneOf(" ", "  ", "\t", "\n", " \t "),
      Gen.oneOf("辽宁大连", "邮编", "１２３", "　", "6464", "00", "646400"))
    val str: Gen[String] =
      Gen.chooseNum(0, 8).flatMap(k => Gen.listOfN(k, piece).map(_.mkString))
    val vs = samples(str, 500)
    assert(vs.size === 500)
    vs.foreach { s =>
      assert(graft.functions.StripPostal.stripPostal6(s) === reference(s),
        s"mismatch on input [${s.replace("\n", "\\n").replace("\t", "\\t")}]")
    }
  }

  test("sanitizeLabel always yields a valid Neo4j label shape") {
    val vs = samples(word, 200)
    val out = vs.toDF("rt")
      .select(ingest.TaggedText.sanitizeLabel($"rt").as("l"))
      .as[String].collect()
    out.foreach { l =>
      assert(l.matches("^(_?[A-Za-z0-9_]+|UnknownDocument)$"), s"bad label: $l")
    }
  }

  test("entity node CSV round-trips hostile strings exactly") {
    val hostile = Seq("a,b", "c\"d\"", "多行\t制表", "'quoted'", "plain", "区块链")
    val dir = java.nio.file.Files.createTempDirectory("rt").toString
    sinks.Neo4jCsv.writeEntityNodes(hostile.toDF("id"), "K", dir)
    val back = spark.read.option("header", "true").option("escape", "\"")
      .csv(dir).select($"`:ID`").as[String].collect().toSet
    assert(back === hostile.toSet)
  }

  test("keyword alias mapping is idempotent (rep of rep = rep)") {
    val m = graph.BibGraph.keywordMapping(spark, TestSpark.TinySf)
    val twice = m.select($"representative".as("original")).distinct()
      .join(m, "original")
      .filter($"original" =!= $"representative")
    assert(twice.isEmpty)
  }
}

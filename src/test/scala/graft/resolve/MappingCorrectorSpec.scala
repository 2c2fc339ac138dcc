package graft.resolve

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** JVM-static corrector: counts invocations (shared across local-mode
  * tasks) and re-points every member of a cluster it sees at "TOUCHED".
  */
object RecordingCorrector extends MappingCorrector {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
  def correct(c: String): Option[String] = {
    calls.incrementAndGet()
    val keys = MappingCorrector.parseResponse(c, Nil).map(_._1)
    Some(MappingCorrector.renderCluster(keys.map(k => (k, "TOUCHED"))))
  }
}

/** The refine-response semantics (`recorrect_mapping.py:33-67,186-204`):
  * line parse with quote stripping, malformed-line skip, self-map
  * fill-in, failed-call fallback, size gating, and the untouched-entry
  * merge.
  */
class MappingCorrectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("response parse: quotes stripped, first ':' splits, repeats overwrite") {
    val resp = "\"DUT\": \"大连理工大学\"\n'大工' : '大连理工大学'\n" +
      "\"DUT\": \"大连理工大学x\"\n\n  \n\"时:间\": \"t\""
    val m = MappingCorrector.parseResponse(resp,
      Seq("DUT", "大工", "时")).toMap
    assert(m("DUT") === "大连理工大学x") // dict overwrite: last wins
    assert(m("大工") === "大连理工大学")
    // key splits at the FIRST ':' — "时 -> 间": "t" parses as key 时
    assert(m("时") === "间\": \"t")
  }

  test("reference-parity caveat: a ':' inside a term truncates on round-trip") {
    // render → echo → re-parse of a colon-bearing term yields a phantom
    // key at the first colon and the real term falls back to self-mapping
    // — the reference parser's exact behavior (recorrect_mapping.py:33-67)
    val term = "AI: applications"
    val parsed = MappingCorrector.parseResponse(
      MappingCorrector.renderCluster(Seq((term, "rep"))), Seq(term)).toMap
    assert(parsed("AI") === "applications\": \"rep")
    assert(parsed(term) === term)
  }

  test("malformed lines are skipped and missing originals self-map") {
    val resp = "no colon here\n\"A\": \"B\""
    val m = MappingCorrector.parseResponse(resp, Seq("A", "C", "D")).toMap
    assert(m === Map("A" -> "B", "C" -> "C", "D" -> "D"))
  }

  test("small clusters never reach the corrector; large ones do") {
    // the corrector runs inside tasks (closure-serialized), so gating is
    // proven through its observable output: it stamps every entry it
    // touches with representative "TOUCHED" — plus a JVM-static call
    // counter (local mode shares the JVM)
    RecordingCorrector.calls.set(0)
    val mapping = Seq(
      ("a1", "a1"), ("a2", "a1"), ("a3", "a1"), // size-3 cluster
      ("b1", "b1"), ("b2", "b1"), // size-2: below the gate
      ("c1", "c1")) // singleton
      .toDF("original", "representative")
    val out = MappingCorrector.refineMapping(mapping, RecordingCorrector, 3)
      .as[(String, String)].collect().toMap
    assert(out === Map("a1" -> "TOUCHED", "a2" -> "TOUCHED",
      "a3" -> "TOUCHED", "b1" -> "b1", "b2" -> "b1", "c1" -> "c1"))
    assert(RecordingCorrector.calls.get() === 1)
  }

  test("a failed corrector call keeps the cluster's original mapping") {
    val failing = new MappingCorrector {
      def correct(c: String): Option[String] = None
    }
    val mapping = Seq(("a1", "a1"), ("a2", "a1"), ("a3", "a1"))
      .toDF("original", "representative")
    val out = MappingCorrector.refineMapping(mapping, failing, 3)
      .as[(String, String)].collect().toMap
    assert(out === Map("a1" -> "a1", "a2" -> "a1", "a3" -> "a1"))
  }

  test("corrector output can split a cluster; untouched entries pass through") {
    // the reference's rule-3 case: the corrector decides 四川科技大学 does
    // not belong and makes it its own representative
    val split = new MappingCorrector {
      def correct(c: String): Option[String] = Some(
        "\"四川大学\": \"四川大学\"\n\"川大\": \"四川大学\"\n" +
          "\"四川科技大学\": \"四川科技大学\"")
    }
    val mapping = Seq(
      ("四川大学", "四川大学"), ("川大", "四川大学"), ("四川科技大学", "四川大学"),
      ("北京大学", "北京大学")) // untouched singleton
      .toDF("original", "representative")
    val out = MappingCorrector.refineMapping(mapping, split, 3)
      .as[(String, String)].collect().toMap
    assert(out("四川科技大学") === "四川科技大学")
    assert(out("川大") === "四川大学")
    assert(out("北京大学") === "北京大学")
  }

  test("promote-second stub sorts numeric keys numerically") {
    // lexicographic order would pick "10" as second ("0","10","2","9");
    // numeric order picks 2
    val resp = PromoteSecondCorrector.correct(
      MappingCorrector.renderCluster(
        Seq(("9", "0"), ("0", "0"), ("10", "0"), ("2", "0")))).get
    val m = MappingCorrector.parseResponse(resp, Nil).toMap
    assert(m.values.toSet === Set("2"))
  }

  test("promote-second returns None (failed call) when every key parses empty") {
    // quote-only originals strip to empty keys and are dropped by the
    // parser; the corrector must signal a failed call, not crash
    assert(PromoteSecondCorrector.correct("\"\"\"\": \"rep\"") === None)
    assert(PromoteSecondCorrector.correct("") === None)
  }
}

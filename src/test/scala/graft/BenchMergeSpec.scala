package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-boot merge semantics: per-query medians over HEALTHY boots,
  * degraded boots excluded and named, crash entries (negative times)
  * never polluting a median.
  */
class BenchMergeSpec extends AnyFunSuite {

  private def rec(qs: String, iter: Double, degraded: Option[Boolean],
      served: String = "") = {
    val d = degraded.map(b => s""","boot_degraded":$b""").getOrElse("")
    val sv = if (served.nonEmpty) s""","served":{$served}""" else ""
    s"""{"metric":"total","value":1.0,"unit":"sec","queries":{$qs},"failed":[],"iter_control_ratio":$iter$d$sv,"sf":"x"}"""
  }

  test("healthy boots merge to per-query medians; degraded boots are excluded") {
    val b1 = BenchMerge.parse("r1", rec(""""q1":1.0,"q2":2.0""", 0.8, Some(false)))
    val b2 = BenchMerge.parse("r2", rec(""""q1":3.0,"q2":4.0""", 0.9, Some(false)))
    val b3 = BenchMerge.parse("r3", rec(""""q1":99.0,"q2":99.0""", 2.5, Some(true)))
    val (med, excluded, degradedUsed, mixed, _) = BenchMerge.merge(Seq(b1, b2, b3))
    assert(med === Map("q1" -> 2.0, "q2" -> 3.0))
    assert(excluded.map(_.path) === Seq("r3"))
    assert(!degradedUsed)
    assert(mixed.isEmpty)
  }

  test("mixed-generation served queries restrict to served-carrying boots") {
    // r1 is a pre-r10-shaped record: q142's per-query value is
    // build-INCLUSIVE (no served entry). r2/r3 are r10+ records whose
    // per-query value is serve-only. The median must come from r2/r3
    // only, and the restriction must be named.
    val b1 = BenchMerge.parse("r1",
      rec(""""q142":30.0,"q1":1.0""", 0.8, Some(false)))
    val b2 = BenchMerge.parse("r2",
      rec(""""q142":2.0,"q1":3.0""", 0.8, Some(false),
        """"q142":{"build_sec":28.0,"serve_sec":2.0}"""))
    val b3 = BenchMerge.parse("r3",
      rec(""""q142":4.0,"q1":5.0""", 0.8, Some(false),
        """"q142":{"build_sec":29.0,"serve_sec":4.0}"""))
    val (med, _, _, mixed, _) = BenchMerge.merge(Seq(b1, b2, b3))
    assert(mixed === Seq("q142"))
    assert(med("q142") === 3.0, "median over r2/r3 only, never r1's 30.0")
    assert(med("q1") === 3.0, "non-served queries keep the all-boot median")
    // all-same-generation (all served): no restriction, nothing named
    val (_, _, _, mixedNone, _) = BenchMerge.merge(Seq(b2, b3))
    assert(mixedNone.isEmpty)
  }

  test("r14 served records with probe fields still parse the build/serve split") {
    // round-14 records append the pre-serve probe readings inside the
    // served object; the split extraction must not require the object
    // to close right after serve_sec
    val b = BenchMerge.parse("r14",
      rec(""""q142":2.0""", 0.8, Some(false),
        """"q142":{"build_sec":28.0,"serve_sec":2.0,""" +
          """"pre_cached_mb":0.0,"pre_heap_mb":1947,"pre_micro_sec":0.2766}"""))
    assert(b.served === Map("q142" -> (28.0, 2.0)))
  }

  test("hot-probe serves are excluded from the median when a clean observation exists, and named") {
    // r1/r2 serve q142 on a clean probe (pre_micro_sec inside the
    // pinned 0.35 band); r3's probe reads hot — its 9.0 s observation
    // is sweep churn, not query cost, and must not pull the median
    def servedProbe(serve: Double, micro: Double) =
      s""""q142":{"build_sec":20.0,"serve_sec":$serve,""" +
        s""""pre_cached_mb":0.0,"pre_heap_mb":2000,"pre_micro_sec":$micro}"""
    val b1 = BenchMerge.parse("r1",
      rec(""""q142":2.0""", 0.8, Some(false), servedProbe(2.0, 0.12)))
    val b2 = BenchMerge.parse("r2",
      rec(""""q142":3.0""", 0.8, Some(false), servedProbe(3.0, 0.30)))
    val b3 = BenchMerge.parse("r3",
      rec(""""q142":9.0""", 0.8, Some(false), servedProbe(9.0, 0.58)))
    assert(b3.probes === Map("q142" -> 0.58) && b3.hotProbe("q142"))
    assert(!b1.hotProbe("q142"))
    val (med, _, _, _, hot) = BenchMerge.merge(Seq(b1, b2, b3))
    assert(med("q142") === 2.5, "median over the clean-probe boots only")
    assert(hot === Seq("r3:q142"))
    // all observations hot: never merge nothing — use them, still flag
    val (medAll, _, _, _, hotAll) = BenchMerge.merge(Seq(b3))
    assert(medAll("q142") === 9.0 && hotAll === Seq("r3:q142"))
    // pre-r14 records without probe fields are clean by construction
    val old = BenchMerge.parse("r0",
      rec(""""q142":4.0""", 0.8, Some(false),
        """"q142":{"build_sec":20.0,"serve_sec":4.0}"""))
    assert(old.probes.isEmpty && !old.hotProbe("q142"))
    val (medMix, _, _, _, hotMix) = BenchMerge.merge(Seq(old, b3))
    assert(medMix("q142") === 4.0 && hotMix === Seq("r3:q142"))
  }

  test("served parsing tolerates unknown/extra fields in the served object (r15 ADVICE 2)") {
    // a future record generation that appends another field after the
    // probe trio — or reorders it — must not silently drop the query
    // from served medians and probe adjudication
    val b = BenchMerge.parse("rX",
      rec(""""q142":2.0""", 0.8, Some(false),
        """"q142":{"build_sec":28.0,"serve_sec":2.0,""" +
          """"pre_cached_mb":0.0,"pre_micro_sec":0.2766,""" +
          """"pre_heap_mb":1947,"some_new_field":1.25}"""))
    assert(b.served === Map("q142" -> (28.0, 2.0)))
    assert(b.probes === Map("q142" -> 0.2766),
      "pre_micro_sec must be found anywhere in the object tail")
  }

  test("served split uses the per-query fallback predicate: clean-probed crash does not desync the sections (r15 ADVICE 3)") {
    // r1's probe is clean but the query CRASHED (negative time); r2's
    // probe is hot with a valid measurement. The per-query median falls
    // back to all observations (no clean boot has a valid time) — the
    // served split must fall back the same way, not median r1's
    // crash-time build/serve alone.
    def servedProbe(serve: Double, micro: Double) =
      s""""q142":{"build_sec":20.0,"serve_sec":$serve,""" +
        s""""pre_cached_mb":0.0,"pre_heap_mb":2000,"pre_micro_sec":$micro}"""
    val b1 = BenchMerge.parse("r1",
      rec(""""q142":-5.0""", 0.8, Some(false), servedProbe(-5.0, 0.12)))
    val b2 = BenchMerge.parse("r2",
      rec(""""q142":3.0""", 0.8, Some(false), servedProbe(3.0, 0.58)))
    val (med, _, _, _, _) = BenchMerge.merge(Seq(b1, b2))
    assert(med("q142") === 3.0,
      "per-query median excludes the crash and falls back past the hot probe")
    // the parity itself: both sections must select b2's observation —
    // merge() and main()'s served split share the predicate
    // `clean.exists(_.queries.get(n).exists(_ >= 0))`, exercised here
    // through the per-query median; the served-split code path is the
    // same expression (BenchMerge.scala main).
  }

  test("hot-AFTER serves are excluded like hot-before: the serve bracket (r17 verdict 4)") {
    // the r17 driver's q165: serve 33.2 s, pre-probe CLEAN (0.187) —
    // a single pre-serve probe cannot see churn arriving mid-serve.
    // The post-serve probe closes the bracket: clean-before/hot-after
    // is excluded under the same clean-survivor fallback.
    def sv(serve: Double, pre: Double, post: Double) =
      s""""q165":{"build_sec":8.0,"serve_sec":$serve,""" +
        s""""pre_cached_mb":0.0,"pre_heap_mb":2000,"pre_micro_sec":$pre,""" +
        s""""pre_build_heap_mb":2000,"pre_build_micro_sec":0.1,""" +
        s""""post_heap_mb":2100,"post_micro_sec":$post}"""
    val b1 = BenchMerge.parse("r1",
      rec(""""q165":8.5""", 0.8, Some(false), sv(8.5, 0.12, 0.14)))
    val b2 = BenchMerge.parse("r2",
      rec(""""q165":9.0""", 0.8, Some(false), sv(9.0, 0.20, 0.22)))
    val b3 = BenchMerge.parse("r3",
      rec(""""q165":33.2""", 0.8, Some(false), sv(33.2, 0.187, 0.95)))
    assert(b3.postProbes === Map("q165" -> 0.95))
    assert(b3.hotProbe("q165"), "clean-before + hot-after IS hot")
    assert(!b1.hotProbe("q165"))
    val (med, _, _, _, hot) = BenchMerge.merge(Seq(b1, b2, b3))
    assert(med("q165") === 8.75, "median over the clean-bracket boots only")
    assert(hot === Seq("r3:q165"))
    val (rows, _) = BenchMerge.servedMedians(Seq(b1, b2, b3))
    assert(rows === Seq(("q165", 8.0, 8.75)),
      "servedMedians excludes the hot-after observation from serve_sec")
    // all observations hot-after: never merge nothing — fall back
    val (rowsAll, _) = BenchMerge.servedMedians(Seq(b3))
    assert(rowsAll === Seq(("q165", 8.0, 33.2)))
    // pre-r18 records carry no post field: no post-side claim
    val old = BenchMerge.parse("r0",
      rec(""""q165":9.5""", 0.8, Some(false),
        """"q165":{"build_sec":8.0,"serve_sec":9.5,"pre_micro_sec":0.1}"""))
    assert(old.postProbes.isEmpty && !old.hotProbe("q165"))
  }

  test("relativeRefs honors a non-default early-boot count (r17 carry)") {
    def withIo(name: String, io: Double) =
      BenchMerge.parse(name, rec(""""q1":1.0""", 0.8, Some(false))
        .replace(""","sf":"x"""", s""","io_probe_sec":$io,"sf":"x""""))
    val boots = Seq(withIo("e1", 1.0), withIo("e2", 2.0), withIo("e3", 3.0),
      withIo("e4", 4.0), withIo("e5", 5.0))
    assert(BenchMerge.relativeRefs(boots)._1 === 2.0, "default take(3)")
    assert(BenchMerge.relativeRefs(boots, 5)._1 === 3.0)
    assert(BenchMerge.relativeRefs(boots, 1)._1 === 1.0)
  }

  test("io-probe adjudication: raw io_probe_sec is parsed; ratio flags only once pinned") {
    val line = rec(""""q1":1.0""", 0.8, Some(false))
      .replace(""","sf":"x"""", ""","io_probe_sec":9.99,"sf":"x"""")
    val b = BenchMerge.parse("rio", line)
    assert(b.ioSec === Some(9.99))
    if (Bench.IoProbeMedian > 0) {
      // pinned: a ≥2× reading excludes the boot from the merge
      assert(b.ioRatio.exists(r => (r >= 2.0) ==
        (9.99 / Bench.IoProbeMedian >= 2.0)))
      val clean = rec(""""q1":1.0""", 0.8, Some(false))
        .replace(""","sf":"x"""",
          s""","io_probe_sec":${Bench.IoProbeMedian},"sf":"x"""")
      val bClean = BenchMerge.parse("rclean", clean)
      assert(bClean.ioRatio.exists(r => math.abs(r - 1.0) < 1e-9))
      val hotLine = rec(""""q1":7.0""", 0.8, Some(false))
        .replace(""","sf":"x"""",
          s""","io_probe_sec":${Bench.IoProbeMedian * 2.5},"sf":"x"""")
      val bHot = BenchMerge.parse("rhot", hotLine)
      val (med, excluded, _, _, _) = BenchMerge.merge(Seq(bClean, bHot))
      assert(excluded.map(_.path) === Seq("rhot"))
      assert(med("q1") === 1.0)
    } else {
      // calibration phase: no pin, no claim — the boot is not excluded
      // on the raw reading alone
      assert(b.ioRatio.isEmpty)
      val (_, excluded, _, _, _) = BenchMerge.merge(Seq(b))
      assert(excluded.isEmpty)
    }
    // records without the field (pre-r15) parse to None either way
    val old = BenchMerge.parse("rold", rec(""""q1":1.0""", 0.8, Some(false)))
    assert(old.ioSec.isEmpty && old.ioRatio.isEmpty)
  }

  test("hot-build probes exclude observations from the build_sec median only (r16 verdict 2)") {
    def sv(build: Double, serve: Double, bMicro: Double) =
      s""""q157":{"build_sec":$build,"serve_sec":$serve,""" +
        s""""pre_cached_mb":0.0,"pre_heap_mb":2000,"pre_micro_sec":0.1,""" +
        s""""pre_build_heap_mb":2000,"pre_build_micro_sec":$bMicro}"""
    val b1 = BenchMerge.parse("r1",
      rec(""""q157":1.0""", 0.8, Some(false), sv(5.0, 1.0, 0.10)))
    val b2 = BenchMerge.parse("r2",
      rec(""""q157":1.2""", 0.8, Some(false), sv(6.0, 1.2, 0.20)))
    val b3 = BenchMerge.parse("r3",
      rec(""""q157":1.1""", 0.8, Some(false), sv(209.8, 1.1, 0.90)))
    assert(b3.buildProbes === Map("q157" -> 0.90))
    assert(b3.hotBuildProbe("q157") && !b1.hotBuildProbe("q157"))
    assert(!b3.hotProbe("q157"), "a hot BUILD probe is not a hot serve")
    val (rows, hotBuilds) = BenchMerge.servedMedians(Seq(b1, b2, b3))
    assert(rows === Seq(("q157", 5.5, 1.1)),
      "build median over the clean-build boots only (the r16 driver's " +
        "209.8 s q158 build would now be excluded and named); serve " +
        "median keeps all three clean-serve observations")
    assert(hotBuilds === Seq("r3:q157"))
    // all builds hot: never merge nothing — fall back, still flagged
    val (rowsAll, hotAll) = BenchMerge.servedMedians(Seq(b3))
    assert(rowsAll === Seq(("q157", 209.8, 1.1)) &&
      hotAll === Seq("r3:q157"))
    // pre-r17 records carry no build probe: clean by construction
    val old = BenchMerge.parse("r0",
      rec(""""q157":1.3""", 0.8, Some(false),
        """"q157":{"build_sec":7.0,"serve_sec":1.3}"""))
    assert(old.buildProbes.isEmpty && !old.hotBuildProbe("q157"))
    val (rowsMix, _) = BenchMerge.servedMedians(Seq(old, b3))
    assert(rowsMix.map(_._1) === Seq("q157") &&
      rowsMix.head._2 === 7.0 &&
      math.abs(rowsMix.head._3 - 1.2) < 1e-9,
      "the probe-less record is the clean-build observation")
  }

  test("campaign-relative io reference: exclusion re-references to the early boots (r16 verdict 6)") {
    def withIo(name: String, q: Double, io: Double) =
      BenchMerge.parse(name, rec(s""""q1":$q""", 0.8, Some(false))
        .replace(""","sf":"x"""", s""","io_probe_sec":$io,"sf":"x""""))
    // a campaign on a SLOWER box than the 0.72 pin: every boot reads
    // ~1.5 s — against the absolute pin all would flag ≥2×, but
    // relative to the campaign's own early boots only the genuinely
    // degraded fourth boot (3.4 = 2.3× the local reference) is out
    val boots = Seq(withIo("c1", 1.0, 1.5), withIo("c2", 1.1, 1.45),
      withIo("c3", 1.2, 1.6), withIo("c4", 9.0, 3.4))
    val ioRef = boots.flatMap(_.ioSec).take(3).sorted.apply(1) // median=1.5
    assert(ioRef === 1.5)
    val (med, excluded, _, _, _) = BenchMerge.merge(boots, ioRef)
    assert(excluded.map(_.path) === Seq("c4"))
    assert(med("q1") === 1.1)
    assert(boots.head.ioRatioVs(ioRef).exists(r => math.abs(r - 1.0) < 1e-9))
    // same boots under the absolute pin: everything ≥2× → all-degraded
    // fallback (merge over all, nothing self-described as excluded)
    if (Bench.IoProbeMedian > 0 && 1.45 / Bench.IoProbeMedian >= 2.0) {
      val (medAbs, exclAbs, degradedUsed, _, _) = BenchMerge.merge(boots)
      assert(degradedUsed && exclAbs.isEmpty && medAbs("q1") === 1.15)
    }
  }

  test("fully-relative mode: in-family probe readings override a pinned boot_degraded flag (r17)") {
    // the r17 sf10 campaign's shape: a box whose graph probe reads
    // ~2.7x the OLD box's pin on every boot — each record self-flags
    // boot_degraded, but the per-scale controls are clean and the
    // readings are IN FAMILY for this campaign. The pinned merge would
    // exclude the campaign's best boot; the relative mode must keep
    // every in-family boot and drop only a true outlier.
    def withProbes(name: String, q: Double, io: Double, iter: Double,
        graph: Double, flagged: Boolean) =
      BenchMerge.parse(name, rec(s""""q1":$q""", 0.8, Some(flagged))
        .replace(""","sf":"x"""",
          s""","iter_probe_sec":$iter,"graph_probe_sec":$graph,""" +
            s""""io_probe_sec":$io,"sf":"x""""))
    val b1 = withProbes("g1", 1.0, 1.6, 4.0, 7.0, flagged = true)
    val b2 = withProbes("g2", 1.2, 1.5, 4.2, 7.4, flagged = true)
    val b3 = withProbes("g3", 9.0, 1.5, 4.1, 22.0, flagged = true) // true outlier
    assert(b1.iterSec === Some(4.0) && b1.graphSec === Some(7.0))
    val (ioRef, iterRef, graphRef) = BenchMerge.relativeRefs(Seq(b1, b2, b3))
    assert(ioRef === 1.5 && iterRef === 4.1 && graphRef === 7.4)
    val (med, excluded, degradedUsed, _, _) = BenchMerge.merge(
      Seq(b1, b2, b3), ioRef, iterRef, graphRef, usePinnedFlag = false)
    assert(excluded.map(_.path) === Seq("g3"),
      "only the out-of-family graph reading excludes; the pinned flag is ignored")
    assert(!degradedUsed && med("q1") === 1.1)
    // the same boots under the pinned mode: every record self-flags →
    // all-degraded fallback
    val (_, exclPinned, degradedPinned, _, _) = BenchMerge.merge(Seq(b1, b2, b3))
    assert(degradedPinned && exclPinned.isEmpty)
  }

  test("pre-r09 records without the flag fall back to the iter-ratio threshold") {
    val old = BenchMerge.parse("old", rec(""""q1":5.0""", 2.4, None))
    assert(old.degraded)
    val ok = BenchMerge.parse("ok", rec(""""q1":5.0""", 0.7, None))
    assert(!ok.degraded)
  }

  test("crash entries (negative) are dropped from the median; all-degraded still merges") {
    val b1 = BenchMerge.parse("r1", rec(""""q1":-3.0,"q2":1.0""", 0.8, Some(false)))
    val b2 = BenchMerge.parse("r2", rec(""""q1":7.0,"q2":2.0""", 0.8, Some(false)))
    val (med, _, _, _, _) = BenchMerge.merge(Seq(b1, b2))
    assert(med === Map("q1" -> 7.0, "q2" -> 1.5))
    // every boot degraded: merge over all rather than nothing — flagged
    // as degraded_used, and NOT self-described as excluded (the record
    // must not claim healthy-boots-only medians)
    val bad = BenchMerge.parse("r3", rec(""""q1":9.0""", 3.0, Some(true)))
    val (med2, excl2, degradedUsed2, _, _) = BenchMerge.merge(Seq(bad))
    assert(med2 === Map("q1" -> 9.0) && excl2.isEmpty && degradedUsed2)
  }
}

package graft

/** Cross-boot bench adjudicator: merges N committed `Bench` JSON records
  * (one per boot, e.g. `bench_sf10/run*.json`) into the per-query
  * CROSS-RUN medians and their sum — the "520.9 s over 7 runs" number
  * round 8 hand-computed, now reproducible from the artifacts alone.
  *
  * Within-boot medians (Bench's n=3 mode) absorb cache/JIT jitter;
  * cross-BOOT medians additionally absorb whole-boot degradation (the
  * contended-scheduler mode `iter_control_ratio` detects). A boot whose
  * record carries `boot_degraded:true` (or probe ratio ≥ 2) is excluded
  * up front and listed, so the merged number is over healthy boots only
  * — the adjudication is in the output, not in prose.
  *
  * Deliberately dependency-free: the records are single-line JSON whose
  * relevant fields are flat, so a targeted regex extraction is exact for
  * this producer (this is NOT a general JSON parser and reads only
  * Bench's own output format).
  *
  * Usage: `runMain graft.BenchMerge out.json in1.json in2.json ...`
  * (first arg = output path, rest = per-boot records).
  */
object BenchMerge {

  private val QueriesRe =
    """"queries":\{([^}]*)\}""".r
  private val PairRe = """"([^"]+)":(-?[0-9][0-9.eE+-]*)""".r
  private val IterRe = """"iter_control_ratio":([0-9][0-9.eE+-]*)""".r
  private val IoRe = """"io_probe_sec":([0-9][0-9.eE+-]*)""".r
  private val IterSecRe = """"iter_probe_sec":([0-9][0-9.eE+-]*)""".r
  private val GraphSecRe = """"graph_probe_sec":([0-9][0-9.eE+-]*)""".r
  private val DegradedRe = """"boot_degraded":(true|false)""".r
  // A served entry is `"name":{"build_sec":N,"serve_sec":N,...}` —
  // matched by its two LEADING fields with a tolerant tail (round-15
  // ADVICE 2: the previous regex enumerated the exact probe trio, so a
  // record generation that adds/reorders any served field would
  // silently drop the query from served medians and probe adjudication;
  // now any extra key:value pairs before the closing brace are
  // accepted, and pre_micro_sec is extracted from the tail separately).
  private val ServedRe =
    (""""([^"]+)":\{"build_sec":(-?[0-9][0-9.eE+-]*),"serve_sec":(-?[0-9][0-9.eE+-]*)""" +
      """([^{}]*)\}""").r
  private val PreMicroRe =
    """"pre_micro_sec":(-?[0-9][0-9.eE+-]*)""".r
  private val PreBuildMicroRe =
    """"pre_build_micro_sec":(-?[0-9][0-9.eE+-]*)""".r
  private val PostMicroRe =
    """"post_micro_sec":(-?[0-9][0-9.eE+-]*)""".r

  /** Pinned per-serve boot-health threshold for the `pre_micro_sec`
    * probe (the fixed data-free job Bench runs immediately before each
    * served query's measured runs). Provenance: the round-14 builder's
    * four committed sf0.1 boots read 0.07–0.35 s across every served
    * query (PERF.md round 14) — a reading above the band's top says the
    * serve ran on a churned scheduler (the r14 driver's hot serves read
    * 0.25–0.59 with heap 10–24 GB). A served observation whose probe
    * exceeds this is excluded from the cross-boot median when a
    * clean-probe observation exists, and named in `hot_probe_serves` —
    * the per-query analogue of `excluded_degraded`.
    */
  val HotProbeMicroSec = 0.35

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  final case class Boot(path: String, queries: Map[String, Double],
      iterRatio: Option[Double], degraded: Boolean,
      served: Map[String, (Double, Double)] = Map.empty,
      probes: Map[String, Double] = Map.empty,
      ioSec: Option[Double] = None,
      buildProbes: Map[String, Double] = Map.empty,
      iterSec: Option[Double] = None,
      graphSec: Option[Double] = None,
      postProbes: Map[String, Double] = Map.empty) {
    /** Hot on EITHER side of the serve bracket (round-17 verdict item
      * 4): the pre-serve probe sees only the start of a 30 s serve —
      * a clean-before/hot-after observation ran into mid-serve churn
      * and is excluded under the same clean-survivor fallback as
      * hot-before. Records without the post field (pre-r18) make no
      * post-side claim. */
    def hotProbe(n: String): Boolean =
      probes.get(n).exists(_ > HotProbeMicroSec) ||
        postProbes.get(n).exists(_ > HotProbeMicroSec)
    /** Pre-BUILD probe over the same [[HotProbeMicroSec]] threshold
      * (round-16 verdict item 2): a served query's standing build that
      * ran on a churned scheduler is excluded from the build_sec median
      * the way hot serves are from serve_sec. Pre-r17 records carry no
      * build probe — clean by construction, no probe no claim. */
    def hotBuildProbe(n: String): Boolean =
      buildProbes.get(n).exists(_ > HotProbeMicroSec)
    /** IO-probe ratio vs the pinned [[Bench.IoProbeMedian]] — computed
      * here from the RAW io_probe_sec (round-15 verdict item 2), so
      * boots recorded DURING the pin's calibration phase (null
      * io_control_ratio in their own record) are still adjudicated by
      * the merge once the pin lands. None while unpinned or pre-r15.
      */
    def ioRatio: Option[Double] = ioRatioVs(Bench.IoProbeMedian)
    /** IO ratio against an arbitrary reference — the campaign-relative
      * mode's hook (round-16 verdict item 6: the absolute pin is one
      * box's provenance; `--relative-io` re-references each merge to
      * its own campaign's early boots so the adjudication survives a
      * provisioning change). */
    def ioRatioVs(ref: Double): Option[Double] =
      if (ref > 0) ioSec.map(_ / ref) else None
  }

  private[graft] def parse(path: String, line: String): Boot = {
    val qs = QueriesRe.findFirstMatchIn(line).map(_.group(1))
      .getOrElse(sys.error(s"$path: no queries field"))
    val pairs = PairRe.findAllMatchIn(qs)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val iter = IterRe.findFirstMatchIn(line).map(_.group(1).toDouble)
    val io = IoRe.findFirstMatchIn(line).map(_.group(1).toDouble)
    val degraded = DegradedRe.findFirstMatchIn(line)
      .map(_.group(1) == "true")
      // pre-r09 records lack the flag: fall back to the ratio threshold
      .getOrElse(iter.exists(_ >= 2.0))
    // the build/serve entries are structurally unambiguous on the whole
    // line (only the served object nests {"build_sec":..,"serve_sec":..})
    val servedMatches = ServedRe.findAllMatchIn(line).toSeq
    val served = servedMatches
      .map(m => m.group(1) -> (m.group(2).toDouble, m.group(3).toDouble))
      .toMap
    val probes = servedMatches
      .flatMap(m => PreMicroRe.findFirstMatchIn(m.group(4))
        .map(p => m.group(1) -> p.group(1).toDouble))
      .toMap
    val buildProbes = servedMatches
      .flatMap(m => PreBuildMicroRe.findFirstMatchIn(m.group(4))
        .map(p => m.group(1) -> p.group(1).toDouble))
      .toMap
    val postProbes = servedMatches
      .flatMap(m => PostMicroRe.findFirstMatchIn(m.group(4))
        .map(p => m.group(1) -> p.group(1).toDouble))
      .toMap
    val iterSec = IterSecRe.findFirstMatchIn(line).map(_.group(1).toDouble)
    val graphSec = GraphSecRe.findFirstMatchIn(line).map(_.group(1).toDouble)
    Boot(path, pairs, iter, degraded, served, probes, io, buildProbes,
      iterSec, graphSec, postProbes)
  }

  /** Returns (per-query medians, boots excluded as degraded,
    * degradedUsed, generation-mixed query names, hot-probe-flagged
    * "path:query" rows). When every boot is degraded the merge falls
    * back to using them all rather than merging nothing; in that case
    * degradedUsed=true and NO boots are reported as excluded — the
    * artifact must not self-describe as healthy-boots-only when the
    * medians came entirely from degraded boots.
    *
    * GENERATION GUARD: round-10 records measure served-family queries
    * serve-only (the build rides in the `served` object); pre-round-10
    * records measured the same queries build-INCLUSIVE. Merging both
    * silently mixed the two semantics in one median — so when SOME but
    * not ALL used boots carry a `served` entry for a query, the
    * query's median is computed from the served-carrying boots only
    * (the current generation) and the query is listed in the returned
    * mixed set so the artifact names the restriction.
    *
    * HOT-PROBE GUARD (round-14 verdict item 6): a served observation
    * whose recorded `pre_micro_sec` exceeds [[HotProbeMicroSec]] ran on
    * a churned scheduler — it is excluded from that query's median when
    * at least one clean-probe observation exists (the per-query
    * analogue of the boot-level exclusion), and listed as
    * "path:query" either way. Boots without probe fields (pre-r14
    * records) are treated as clean — no probe, no claim.
    */
  /** Campaign-relative probe references: per probe, the median of the
    * first ≤3 boots' RAW readings (argument order = campaign order). 0
    * when no record carries the probe — that leg then makes no claim.
    * This is the box-change hedge (round-16 item 6, generalized by the
    * r17 campaign's own evidence: this round's box reads the graph
    * probe 2.7× the old-box pin on a boot whose per-scale CONTROLS are
    * clean at 1.07 — the pinned flag then excludes the campaign's BEST
    * boot and keeps the worse one).
    */
  private[graft] def relativeRefs(boots: Seq[Boot], earlyBoots: Int = 3)
      : (Double, Double, Double) = {
    def ref(xs: Seq[Double]) =
      if (xs.isEmpty) 0.0 else median(xs.take(earlyBoots))
    (ref(boots.flatMap(_.ioSec)), ref(boots.flatMap(_.iterSec)),
      ref(boots.flatMap(_.graphSec)))
  }

  private[graft] def merge(boots: Seq[Boot],
      ioRef: Double = Bench.IoProbeMedian,
      iterRef: Double = 0, graphRef: Double = 0,
      usePinnedFlag: Boolean = true)
      : (Map[String, Double], Seq[Boot], Boolean, Seq[String], Seq[String]) = {
    // a boot is excluded if its own record flagged it (pinned modes
    // only — the in-record flag compares against the OLD box's pins,
    // which the fully-relative mode exists to ignore) OR a raw probe
    // reads ≥2× its reference (round-15 item 2: calibration-phase
    // records carry raw probes but null ratios — the merge adjudicates
    // retroactively). References default to the committed pins; the
    // campaign-relative modes pass their own (round-16 item 6).
    val (bad, good) = boots.partition { b =>
      (usePinnedFlag && b.degraded) ||
        b.ioRatioVs(ioRef).exists(_ >= 2.0) ||
        (iterRef > 0 && b.iterSec.exists(_ / iterRef >= 2.0)) ||
        (graphRef > 0 && b.graphSec.exists(_ / graphRef >= 2.0))
    }
    val degradedUsed = good.isEmpty && bad.nonEmpty
    val use = if (good.nonEmpty) good else boots // never merge nothing
    val names = use.flatMap(_.queries.keys).distinct.sorted
    val mixed = names.filter { n =>
      val having = use.filter(_.queries.contains(n))
      val withServed = having.count(_.served.contains(n))
      withServed > 0 && withServed < having.size
    }
    val hotFlags = for {
      n <- names
      b <- use
      if b.queries.contains(n) && b.hotProbe(n)
    } yield s"${b.path}:$n"
    val med = names.map { n =>
      // negative entries are Bench's crash convention — excluded from the
      // median the same way Bench's own totals exclude them
      val gen0 = if (mixed.contains(n)) use.filter(_.served.contains(n)) else use
      val clean = gen0.filterNot(_.hotProbe(n))
      // exclude hot-probe observations only when a clean one survives;
      // all-hot falls back to using them (same never-merge-nothing
      // convention as degraded boots — the rows stay flagged)
      val gen =
        if (clean.exists(_.queries.get(n).exists(_ >= 0))) clean else gen0
      val ts = gen.flatMap(_.queries.get(n)).filter(_ >= 0)
      n -> (if (ts.nonEmpty) median(ts) else -1.0)
    }.toMap
    (med, if (degradedUsed) Seq.empty else bad, degradedUsed, mixed,
      hotFlags)
  }

  /** Cross-boot build/serve medians for the served family, over the
    * already-filtered boot set. serve_sec medians exclude hot-SERVE-probe
    * observations (when a clean one with a valid measurement survives —
    * the same predicate as the per-query medians); build_sec medians
    * independently exclude hot-BUILD-probe observations under the same
    * convention (round-16 verdict item 2). Returns the per-query
    * (build, serve) medians plus the "path:query" rows whose build
    * probe read hot.
    */
  private[graft] def servedMedians(use: Seq[Boot])
      : (Seq[(String, Double, Double)], Seq[String]) = {
    val servedNames = use.flatMap(_.served.keys).distinct.sorted
    val hotBuilds = for {
      n <- servedNames
      b <- use
      if b.served.contains(n) && b.hotBuildProbe(n)
    } yield s"${b.path}:$n"
    val rows = servedNames.map { n =>
      val having = use.filter(_.served.contains(n))
      // SERVE median: same fallback predicate as the per-query medians
      // (round-15 ADVICE 3) — hot-probe observations are excluded only
      // when a clean observation WITH A VALID (>=0) measurement survives
      val cleanServe = having.filterNot(_.hotProbe(n))
      val serveObs =
        (if (cleanServe.exists(_.queries.get(n).exists(_ >= 0))) cleanServe
         else having).flatMap(_.served.get(n))
      // BUILD median: the same convention against the PRE-BUILD probe —
      // a hot-build observation drops out only when a clean-build boot
      // with a non-crashed (>=0) build survives
      val cleanBuild = having.filterNot(_.hotBuildProbe(n))
      val buildObs =
        (if (cleanBuild.exists(_.served.get(n).exists(_._1 >= 0))) cleanBuild
         else having).flatMap(_.served.get(n))
      (n, median(buildObs.map(_._1)), median(serveObs.map(_._2)))
    }
    (rows, hotBuilds)
  }

  def main(args: Array[String]): Unit = {
    // optional leading flag: --relative-io re-references the io
    // adjudication to THIS campaign's own early boots (median of the
    // first ≤3 records carrying io_probe_sec, in argument order =
    // campaign order) instead of the absolute pin — round-16 verdict
    // item 6: the 0.72 pin is one box's provenance; a box change
    // invalidates it, while early-campaign self-reference does not.
    val (flags, rest) = args.partition(_.startsWith("--"))
    val known = Set("--relative-io", "--relative")
    val relativeIo = flags.contains("--relative-io")
    // --relative generalizes --relative-io to ALL THREE probes and
    // ignores the records' pinned boot_degraded flag: every reference
    // is the campaign's own early boots, so the adjudication survives a
    // box whose probe profile differs wholesale from the pins
    val relativeAll = flags.contains("--relative")
    // reference-set size for the relative modes (round-17 carry: the
    // early-boot count folded into a flag instead of a magic 3)
    val EarlyBootsFlag = "--early-boots="
    val earlyBoots = flags.collectFirst {
      case f if f.startsWith(EarlyBootsFlag) =>
        f.stripPrefix(EarlyBootsFlag).toInt
    }.getOrElse(3)
    require(earlyBoots >= 1, s"--early-boots must be >= 1: $earlyBoots")
    require(flags.forall(f => known(f) || f.startsWith(EarlyBootsFlag)),
      s"unknown flag(s): " +
        flags.filterNot(f => known(f) || f.startsWith(EarlyBootsFlag))
          .mkString(","))
    require(rest.length >= 2,
      "usage: BenchMerge [--relative-io|--relative] [--early-boots=N] " +
        "<out.json> <in.json>...")
    val boots = rest.drop(1).toSeq.map { p =>
      parse(p, scala.io.Source.fromFile(p).getLines().mkString("\n"))
    }
    val (ioRefRel, iterRefRel, graphRefRel) = relativeRefs(boots, earlyBoots)
    val ioRef =
      if (relativeIo || relativeAll) {
        require(ioRefRel > 0,
          "relative mode: no input record carries io_probe_sec")
        ioRefRel
      } else Bench.IoProbeMedian
    val (med, excluded, degradedUsed, mixed, hotFlags) =
      if (relativeAll)
        merge(boots, ioRef, iterRefRel, graphRefRel, usePinnedFlag = false)
      else merge(boots, ioRef)
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val total = med.values.filter(_ >= 0).sum
    val qs = med.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + num(v) }.mkString("{", ",", "}")
    val excl = excluded.map(b => "\"" + b.path + "\"").mkString("[", ",", "]")
    // cross-boot medians for the build/serve split, over the same boot
    // set the query medians use (healthy boots, or all under fallback) —
    // minus hot-probe observations when a clean one exists, matching the
    // per-query medians' exclusion
    val use = boots.filterNot(b => excluded.exists(_.path == b.path))
    val (servedRows, hotBuilds) = servedMedians(use)
    val served = servedRows.map { case (n, bMed, sMed) =>
      "\"" + n + "\":{\"build_sec\":" + num(bMed) +
        ",\"serve_sec\":" + num(sMed) + "}"
    }.mkString("{", ",", "}")
    val mixedJson = mixed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val hotJson = hotFlags.map("\"" + _ + "\"").mkString("[", ",", "]")
    val hotBuildJson = hotBuilds.map("\"" + _ + "\"").mkString("[", ",", "]")
    // per-boot IO-probe ratios vs the reference in effect (the pinned
    // median, or this campaign's early-boot median under --relative-io)
    // — the record of WHY a boot was excluded, and the sub-2× drift
    // divisor for cross-round reads
    val ioJson = boots.flatMap(b => b.ioRatioVs(ioRef).map(r =>
      "\"" + b.path + "\":" + num(r))).mkString("{", ",", "}")
    val ioMode =
      if (relativeAll) "relative" else if (relativeIo) "relative-io"
      else "pinned"
    val refsJson =
      if (relativeAll)
        s""","probe_refs":{"io":${num(ioRefRel)},"iter":${num(iterRefRel)},"graph":${num(graphRefRel)}}"""
      else ""
    // relative exclusion is mathematically inert with <=2 probe-carrying
    // records (round-17 ADVICE 1: with n=2 a boot cannot read >=2x a
    // median it participates in) — the merged artifact says so instead
    // of silently presenting an unexcludable set as adjudicated
    val probeCarrying = boots.count(_.ioSec.nonEmpty)
    val underpoweredJson =
      if (relativeAll || relativeIo)
        s""","relative_underpowered":${probeCarrying < 3}"""
      else ""
    val json =
      s"""{"metric":"cross_run_median_total","value":${num(total)},"unit":"sec","n_boots":${boots.size},"n_excluded":${excluded.size},"excluded_degraded":$excl,"degraded_used":$degradedUsed,"generation_mixed":$mixedJson,"hot_probe_threshold":${num(HotProbeMicroSec)},"hot_probe_serves":$hotJson,"hot_probe_builds":$hotBuildJson,"io_ref_mode":"$ioMode"$refsJson$underpoweredJson,"io_probe_median":${num(ioRef)},"io_ratios":$ioJson,"served":$served,"queries":$qs}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(rest(0)),
      json.getBytes("UTF-8"))
    println(json)
  }
}

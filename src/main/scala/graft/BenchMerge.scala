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
      ioSec: Option[Double] = None) {
    def hotProbe(n: String): Boolean =
      probes.get(n).exists(_ > HotProbeMicroSec)
    /** IO-probe ratio vs the pinned [[Bench.IoProbeMedian]] — computed
      * here from the RAW io_probe_sec (round-15 verdict item 2), so
      * boots recorded DURING the pin's calibration phase (null
      * io_control_ratio in their own record) are still adjudicated by
      * the merge once the pin lands. None while unpinned or pre-r15.
      */
    def ioRatio: Option[Double] =
      if (Bench.IoProbeMedian > 0) ioSec.map(_ / Bench.IoProbeMedian)
      else None
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
    Boot(path, pairs, iter, degraded, served, probes, io)
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
  private[graft] def merge(boots: Seq[Boot])
      : (Map[String, Double], Seq[Boot], Boolean, Seq[String], Seq[String]) = {
    // a boot is excluded if its own record flagged it OR its raw
    // io_probe_sec reads ≥2× the pinned IoProbeMedian (round-15 item 2:
    // calibration-phase records carry the raw probe but a null ratio —
    // the merge adjudicates them retroactively once the pin exists)
    val (bad, good) =
      boots.partition(b => b.degraded || b.ioRatio.exists(_ >= 2.0))
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

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchMerge <out.json> <in.json>...")
    val boots = args.drop(1).toSeq.map { p =>
      parse(p, scala.io.Source.fromFile(p).getLines().mkString("\n"))
    }
    val (med, excluded, degradedUsed, mixed, hotFlags) = merge(boots)
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
    val servedNames = use.flatMap(_.served.keys).distinct.sorted
    val served = servedNames.map { n =>
      val having = use.filter(_.served.contains(n))
      val clean = having.filterNot(_.hotProbe(n))
      // SAME fallback predicate as the per-query medians (round-15
      // ADVICE 3): hot-probe observations are excluded only when a
      // clean observation WITH A VALID (>=0) measurement survives — a
      // boot that probed clean but crashed on the query must not make
      // the two sections adjudicate from different boot sets
      val obs = (if (clean.exists(_.queries.get(n).exists(_ >= 0))) clean
                 else having).flatMap(_.served.get(n))
      "\"" + n + "\":{\"build_sec\":" + num(median(obs.map(_._1))) +
        ",\"serve_sec\":" + num(median(obs.map(_._2))) + "}"
    }.mkString("{", ",", "}")
    val mixedJson = mixed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val hotJson = hotFlags.map("\"" + _ + "\"").mkString("[", ",", "]")
    // per-boot IO-probe ratios vs the pinned median (null pin or
    // pre-probe records contribute nothing) — the record of WHY a boot
    // was excluded, and the sub-2× drift divisor for cross-round reads
    val ioJson = boots.flatMap(b => b.ioRatio.map(r =>
      "\"" + b.path + "\":" + num(r))).mkString("{", ",", "}")
    val json =
      s"""{"metric":"cross_run_median_total","value":${num(total)},"unit":"sec","n_boots":${boots.size},"n_excluded":${excluded.size},"excluded_degraded":$excl,"degraded_used":$degradedUsed,"generation_mixed":$mixedJson,"hot_probe_threshold":${num(HotProbeMicroSec)},"hot_probe_serves":$hotJson,"io_probe_median":${num(Bench.IoProbeMedian)},"io_ratios":$ioJson,"served":$served,"queries":$qs}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(args(0)),
      json.getBytes("UTF-8"))
    println(json)
  }
}

#!/bin/bash
# Round-16 bench campaign, part 2 — runs AFTER Bench.IoProbeMedian is
# pinned from part 1's calibration readings (and the pin recompiled):
# the remaining 10x/100x boots record a live io_control_ratio, the
# 100x compaction-policy cell prices q169's conf'd trigger against
# q163/q166 (round-15 item 4), and BenchMerge re-emits every r16 merge
# with the io-ratio adjudication (item 2) — part 1's calibration boots
# are adjudicated retroactively from their raw io_probe_sec.
set -e
cd /root/repo

step() { echo "=== $(date +%T) $1 ==="; }
rec() { grep -o '{"metric".*' "$1" | head -1 > "$2"; }

step "10x sweep run2"
bash tools/run_sf10.sh 2 /root/repo/bench_sf1 r16_sf1

step "100x sweep run2"
bash tools/run_sf10.sh 2 /root/repo/bench_sf10 r16_sf10

step "q163-vs-q166-vs-q169 compaction cell at 100x (n=3) - item 4"
SPARK_GRAFT_SF_DIR=/root/repo/bench_sf10 \
  SPARK_GRAFT_ONLY=q163_er_crud_lifecycle_mor,q166_er_crud_lifecycle_mor_compact,q169_er_mor_compact_policy \
  sbt -batch "runMain graft.Bench" > bench/r16_sf10_compact_focused.raw 2>&1
rec bench/r16_sf10_compact_focused.raw bench/r16_sf10_compact_focused.json

step "per-day MOR compaction pricing at 100x (onPhase) - item 4"
sbt -batch "Test/runMain graft.resolve.ProfileMorCompaction /root/repo/bench_sf10" \
  > bench/r16_profile_mor_compaction.txt 2>&1 || true

step "emit merges (io-ratio-adjudicated)"
sbt -batch "runMain graft.BenchMerge bench/r16_sf01_merged.json bench/r16_sf01_run1.json bench/r16_sf01_run2.json bench/r16_sf01_run3.json" \
  > /dev/null 2>&1
sbt -batch "runMain graft.BenchMerge bench/r16_sf1_merged.json bench/r16_sf1_run1.json bench/r16_sf1_run2.json" \
  > /dev/null 2>&1
sbt -batch "runMain graft.BenchMerge bench/r16_sf10_merged.json bench/r16_sf10_run1.json bench/r16_sf10_run2.json" \
  > /dev/null 2>&1

step "CAMPAIGN2 DONE"

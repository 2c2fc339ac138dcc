#!/bin/bash
# Round-15 bench campaign (round-14 verdict items 1/3/5/6/7): sf0.1
# round-record sweeps with the snapshot-reset tagged lifecycles + q166,
# the scoped-vs-full / MOW-vs-MOR tagged lifecycle profile at 30k/100k
# terms, 10x/100x registry sweeps, the q163-vs-q166 post-compaction-day
# cell at 100x, and the hot-probe-aware merge re-emission. Serial on
# purpose: each step owns the box (bench numbers are polluted by CPU
# contention).
set -e
cd /root/repo

step() { echo "=== $(date +%T) $1 ==="; }
rec() { grep -o '{"metric".*' "$1" | head -1 > "$2"; }

step "sf0.1 full sweep run1 (default order, n=3)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > bench/r15_sf01_run1.raw 2>&1
rec bench/r15_sf01_run1.raw bench/r15_sf01_run1.json

step "sf0.1 full sweep run2 (default order, n=3)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > bench/r15_sf01_run2.raw 2>&1
rec bench/r15_sf01_run2.raw bench/r15_sf01_run2.json

step "tagged lifecycle profile (scoped daySource + MOW-vs-MOR) at 30k/100k - items 1/5/7"
sbt -batch "Test/runMain graft.resolve.ProfileTaggedLifecycle 30000 100000" \
  > bench/r15_profile_tagged_lifecycle.txt 2>&1 || true

step "10x sweep run1 (full registry incl q166)"
bash tools/run_sf10.sh 1 /root/repo/bench_sf1 r15_sf1

step "100x sweep run1 (full registry incl q166)"
bash tools/run_sf10.sh 1 /root/repo/bench_sf10 r15_sf10

step "q163-vs-q166 post-compaction-day cell at 100x (n=3) - item 3"
SPARK_GRAFT_SF_DIR=/root/repo/bench_sf10 \
  SPARK_GRAFT_ONLY=q163_er_crud_lifecycle_mor,q166_er_crud_lifecycle_mor_compact \
  sbt -batch "runMain graft.Bench" > bench/r15_sf10_compact_focused.raw 2>&1
rec bench/r15_sf10_compact_focused.raw bench/r15_sf10_compact_focused.json

step "per-day MOR compaction pricing at 100x (onPhase) - item 3"
sbt -batch "Test/runMain graft.resolve.ProfileMorCompaction /root/repo/bench_sf10" \
  > bench/r15_profile_mor_compaction.txt 2>&1 || true

step "sf0.1 full sweep run3 (default order, n=3)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > bench/r15_sf01_run3.raw 2>&1
rec bench/r15_sf01_run3.raw bench/r15_sf01_run3.json

step "re-emit merges with hot-probe adjudication - item 6"
sbt -batch "runMain graft.BenchMerge bench/r14_sf1_merged.json bench/r14_sf1_run1.json bench/r14_sf1_run2.json bench/r14_sf1_run3.json" \
  > /dev/null 2>&1
sbt -batch "runMain graft.BenchMerge bench/r14_sf10_merged.json bench/r14_sf10_run1.json bench/r14_sf10_run2.json bench/r14_sf10_run3.json" \
  > /dev/null 2>&1
sbt -batch "runMain graft.BenchMerge bench/r15_sf01_merged.json bench/r15_sf01_run1.json bench/r15_sf01_run2.json bench/r15_sf01_run3.json" \
  > /dev/null 2>&1

step "CAMPAIGN DONE"

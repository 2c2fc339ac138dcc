#!/bin/bash
# Round-15 campaign, part 2: the scale steps that part 1 ran against
# missing fixtures (the gitignored bench_sf1/bench_sf10 replica dirs are
# regenerated per round by tools/make_sfN.py), plus the file-based
# tagged-lifecycle profile (real TaggedText parse, so the scoped-vs-full
# cell measures an actual ingest term). Serial on purpose.
set -e
cd /root/repo

step() { echo "=== $(date +%T) $1 ==="; }
rec() { grep -o '{"metric".*' "$1" | head -1 > "$2"; }

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

step "tagged lifecycle profile (REAL parse, scoped daySource, MOW-vs-MOR) at 30k/100k"
sbt -batch "Test/runMain graft.resolve.ProfileTaggedLifecycle 30000 100000" \
  > bench/r15_profile_tagged_lifecycle.txt 2>&1 || true

step "10x sweep run2"
bash tools/run_sf10.sh 2 /root/repo/bench_sf1 r15_sf1

step "100x sweep run2"
bash tools/run_sf10.sh 2 /root/repo/bench_sf10 r15_sf10

step "re-emit 10x/100x merges (hot-probe-aware)"
sbt -batch "runMain graft.BenchMerge bench/r15_sf1_merged.json bench/r15_sf1_run1.json bench/r15_sf1_run2.json" \
  > /dev/null 2>&1
sbt -batch "runMain graft.BenchMerge bench/r15_sf10_merged.json bench/r15_sf10_run1.json bench/r15_sf10_run2.json" \
  > /dev/null 2>&1

step "CAMPAIGN2 DONE"

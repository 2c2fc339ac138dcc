#!/bin/bash
# Round-14 bench campaign (verdict items 1/3/4/5/6): the q156
# served-first/served-last attribution boot pair with per-serve probes,
# the q84 clean-iter confirmation boot, round-record sweeps at
# 10x/100x including q163/q164, the q162-vs-q163 MOR advance cell at
# 100x, the q152 retune-point run at 10x, and the real-ingest lifecycle
# profile at scaled term universes. Serial on purpose: each step owns
# the box (bench numbers are polluted by CPU contention).
set -e
cd /root/repo

step() { echo "=== $(date +%T) $1 ==="; }
rec() { grep -o '{"metric".*' "$1" | head -1 > "$2"; }

step "sf0.1 full sweep run1 (default order, n=3) - served-LAST side of item 1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > bench/r14_sf01_run1.raw 2>&1
rec bench/r14_sf01_run1.raw bench/r14_sf01_run1.json

step "sf0.1 full sweep run2 (SERVED-FIRST, n=3) - item 1 pair"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SERVED_POSITION=first \
  sbt -batch "runMain graft.Bench" > bench/r14_sf01_servedfirst.raw 2>&1
rec bench/r14_sf01_servedfirst.raw bench/r14_sf01_servedfirst.json

step "q84 focused boot (n=3) - item 3 clean-iter confirmation attempt"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY=q84_coauthor_reach \
  sbt -batch "runMain graft.Bench" > bench/r14_sf01_q84_focused.raw 2>&1
rec bench/r14_sf01_q84_focused.raw bench/r14_sf01_q84_focused.json

step "lifecycle profile at 30k/100k term universes - item 6"
sbt -batch "Test/runMain graft.resolve.ProfileTaggedLifecycle 30000 100000" \
  > bench/r14_profile_lifecycle.txt 2>&1 || true

step "10x sweep run1 (full registry incl q163/q164)"
bash tools/run_sf10.sh 1 /root/repo/bench_sf1 r14_sf1

step "q152 retune point at 10x (lo=4 hi=10 margin=0.2, n=3) - item 5"
SPARK_GRAFT_SF_DIR=/root/repo/bench_sf1 \
  SPARK_GRAFT_ONLY=q152_semantic_dedup_boundary \
  SPARK_GRAFT_SEMDEDUP_HI=10 SPARK_GRAFT_SEMDEDUP_MARGIN=0.2 \
  sbt -batch "runMain graft.Bench" > bench/r14_sf1_q152_retune.raw 2>&1
rec bench/r14_sf1_q152_retune.raw bench/r14_sf1_q152_retune.json

step "q152 shipped point at 10x (same boot conditions, n=3) - item 5 control"
SPARK_GRAFT_SF_DIR=/root/repo/bench_sf1 \
  SPARK_GRAFT_ONLY=q152_semantic_dedup_boundary \
  sbt -batch "runMain graft.Bench" > bench/r14_sf1_q152_default.raw 2>&1
rec bench/r14_sf1_q152_default.raw bench/r14_sf1_q152_default.json

step "100x sweep run1 (full registry incl q163/q164)"
bash tools/run_sf10.sh 1 /root/repo/bench_sf10 r14_sf10

step "q162-vs-q163 MOR advance cell at 100x (n=3) - item 4"
SPARK_GRAFT_SF_DIR=/root/repo/bench_sf10 \
  SPARK_GRAFT_ONLY=q162_er_crud_lifecycle,q163_er_crud_lifecycle_mor \
  sbt -batch "runMain graft.Bench" > bench/r14_sf10_mor_focused.raw 2>&1
rec bench/r14_sf10_mor_focused.raw bench/r14_sf10_mor_focused.json

step "CAMPAIGN DONE"

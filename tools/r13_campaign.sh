#!/bin/bash
# Round-13 bench campaign (verdict items 2/3/5): committed sf0.1 sweeps,
# a same-boot served-family focused run (sparse-vs-dense adjudication),
# 10x/100x sweeps including the full served matrix, and the q152
# boundary-recall measurement at 10x. Serial on purpose: each step owns
# the box (bench numbers are polluted by CPU contention).
set -e
cd /root/repo
SERVED=q142_answer_served,q143_er_incremental_served,q147_stream_to_serve,q150_er_tombstones_served,q153_er_tombstones_sparse,q155_er_updates_served,q156_er_updates_sparse,q157_tagged_er_updates_served,q158_tagged_er_tombstones_served

step() { echo "=== $(date +%T) $1 ==="; }

step "sf0.1 full sweep run1 (n=3)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > bench/r13_sf01_run1.raw 2>&1
grep -o '{"metric".*' bench/r13_sf01_run1.raw > bench/r13_sf01_run1.json

step "served-family focused boot (n=3) - item 3 adjudication"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY=$SERVED \
  sbt -batch "runMain graft.Bench" > bench/r13_sf01_served_focused.raw 2>&1
grep -o '{"metric".*' bench/r13_sf01_served_focused.raw \
  > bench/r13_sf01_served_focused.json

step "sf0.1 full sweep run2 (n=3)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > bench/r13_sf01_run2.raw 2>&1
grep -o '{"metric".*' bench/r13_sf01_run2.raw > bench/r13_sf01_run2.json

step "10x sweep run1"
bash tools/run_sf10.sh 1 /root/repo/bench_sf1 r13_sf1
step "10x sweep run2"
bash tools/run_sf10.sh 2 /root/repo/bench_sf1 r13_sf1

step "q152 boundary recall at 10x"
python3 tools/recall_boundary.py /root/repo/bench_sf1 \
  > bench/r13_recall_boundary_sf1.txt 2>&1 || true

step "100x sweep run1"
bash tools/run_sf10.sh 1 /root/repo/bench_sf10 r13_sf10
step "100x sweep run2"
bash tools/run_sf10.sh 2 /root/repo/bench_sf10 r13_sf10
step "100x sweep run3"
bash tools/run_sf10.sh 3 /root/repo/bench_sf10 r13_sf10

step "CAMPAIGN DONE"

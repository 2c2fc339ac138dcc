#!/bin/bash
# Round-14 campaign part 2: extra q84 clean-iter attempts (item 3) and
# second boots at each scale so the round's medians are cross-boot.
set -e
cd /root/repo

step() { echo "=== $(date +%T) $1 ==="; }
rec() { grep -o '{"metric".*' "$1" | head -1 > "$2"; }

for i in 2 3; do
  step "q84 focused boot attempt $i (n=3)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY=q84_coauthor_reach \
    sbt -batch "runMain graft.Bench" > bench/r14_sf01_q84_focused$i.raw 2>&1
  rec bench/r14_sf01_q84_focused$i.raw bench/r14_sf01_q84_focused$i.json
done

step "sf0.1 full sweep run2 (default order, n=3)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > bench/r14_sf01_run2.raw 2>&1
rec bench/r14_sf01_run2.raw bench/r14_sf01_run2.json

step "10x sweep run2"
bash tools/run_sf10.sh 2 /root/repo/bench_sf1 r14_sf1

step "100x sweep run2"
bash tools/run_sf10.sh 2 /root/repo/bench_sf10 r14_sf10

step "CAMPAIGN2 DONE"

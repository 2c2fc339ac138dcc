#!/bin/bash
# One full-registry bench sweep at the 100x replica scale (bench_sf10),
# minus the two size-guarded exact anchors (q50/q51 — their guards throw
# past MaxExactVectors by design; the blocked twins q52/q124 are the
# scale path and ARE in the sweep). Usage: run_sf10.sh <runN> [sf_dir] [tag]
# In-boot repetition stays n=1 (BENCH_RUNS=1): the sweep methodology is
# medians ACROSS boots; the round-8 default n=3 exists for the driver's
# single-boot record.
cd /root/repo
ONLY=$(python3 -c "
import json
qs=sorted(set(json.load(open('CORRECTNESS_r16.json'))))
print(','.join(q for q in qs if not q.startswith(('q50_','q51_'))))")
RUN=${1:-1}
SF_DIR=${2:-/root/repo/bench_sf10}
TAG=${3:-r08_sf10}
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_ONLY="$ONLY" SPARK_GRAFT_BENCH_RUNS=1 \
  sbt -batch "runMain graft.Bench" > /root/repo/bench/${TAG}_run$RUN.raw 2>&1
grep -o '{"metric".*' /root/repo/bench/${TAG}_run$RUN.raw \
  > /root/repo/bench/${TAG}_run$RUN.json
echo DONE_RUN_$RUN

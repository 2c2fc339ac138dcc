#!/bin/bash
# One full-registry bench sweep at the 100x replica scale (bench_sf10),
# minus the two size-guarded exact anchors (q50/q51 — their guards throw
# past MaxExactVectors by design; the blocked twins q52/q124 are the
# scale path and ARE in the sweep). Usage: run_sf10.sh <runN>
cd /root/repo
ONLY=$(python3 -c "
import json
qs=sorted(json.load(open('CORRECTNESS_r06.json')))
print(','.join(q for q in qs if not q.startswith(('q50_','q51_'))))")
RUN=${1:-1}
SPARK_GRAFT_SF_DIR=/root/repo/bench_sf10 SPARK_GRAFT_ONLY="$ONLY" \
  sbt -batch "runMain graft.Bench" > /root/repo/bench/r07_sf10_run$RUN.raw 2>&1
grep -o '{"metric".*' /root/repo/bench/r07_sf10_run$RUN.raw \
  > /root/repo/bench/r07_sf10_run$RUN.json
echo DONE_RUN_$RUN

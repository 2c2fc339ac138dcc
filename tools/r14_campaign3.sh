#!/bin/bash
# Round-14 campaign part 3: the q161-vs-q165 same-boot MOR cell at the
# real-ingest fixture, plus third boots at 10x/100x so the round's
# merges are 3-boot medians.
set -e
cd /root/repo

step() { echo "=== $(date +%T) $1 ==="; }
rec() { grep -o '{"metric".*' "$1" | head -1 > "$2"; }

step "q161-vs-q165 real-ingest MOR cell (sf0.1, n=3)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_ONLY=q161_tagged_er_crud_lifecycle,q165_tagged_er_crud_lifecycle_mor \
  sbt -batch "runMain graft.Bench" > bench/r14_sf01_ingest_mor.raw 2>&1
rec bench/r14_sf01_ingest_mor.raw bench/r14_sf01_ingest_mor.json

step "10x sweep run3"
bash tools/run_sf10.sh 3 /root/repo/bench_sf1 r14_sf1

step "100x sweep run3"
bash tools/run_sf10.sh 3 /root/repo/bench_sf10 r14_sf10

step "CAMPAIGN3 DONE"

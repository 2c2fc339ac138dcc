#!/bin/bash
# Round-16 bench campaign, part 1 (round-15 verdict items 1/2/7): the
# io-probe CALIBRATION boots. Five full-registry boots — now including
# q167 in-band, the narrow-carry q164 as shipped code, and the new
# q168/q169 gates — each records io_probe_sec; after this part the pin
# lands in Bench.IoProbeMedian (≥5 healthy-boot observations, the
# GraphProbeMedian discipline) and part 2 runs the remaining boots +
# merges under the pinned threshold. Serial on purpose: each step owns
# the box (bench numbers are polluted by CPU contention).
set -e
cd /root/repo

step() { echo "=== $(date +%T) $1 ==="; }
rec() { grep -o '{"metric".*' "$1" | head -1 > "$2"; }

step "sf0.1 full sweep run1 (default order, n=3)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > bench/r16_sf01_run1.raw 2>&1
rec bench/r16_sf01_run1.raw bench/r16_sf01_run1.json

step "sf0.1 full sweep run2 (default order, n=3)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > bench/r16_sf01_run2.raw 2>&1
rec bench/r16_sf01_run2.raw bench/r16_sf01_run2.json

step "sf0.1 full sweep run3 (default order, n=3)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > bench/r16_sf01_run3.raw 2>&1
rec bench/r16_sf01_run3.raw bench/r16_sf01_run3.json

step "10x sweep run1 (full registry incl q167/q168/q169)"
bash tools/run_sf10.sh 1 /root/repo/bench_sf1 r16_sf1

step "100x sweep run1 (full registry incl q167/q168/q169)"
bash tools/run_sf10.sh 1 /root/repo/bench_sf10 r16_sf10

step "tagged lifecycle 30k cell (item 7) + 100k profile"
sbt -batch "Test/runMain graft.resolve.ProfileTaggedLifecycle 30000 100000" \
  > bench/r16_profile_tagged_lifecycle.txt 2>&1 || true
grep -o '{"metric":"tagged_lifecycle","n":30000.*' \
  bench/r16_profile_tagged_lifecycle.txt | head -1 \
  > bench/r16_tagged_30k.json || true

step "PART 1 DONE — pin Bench.IoProbeMedian from the five io_probe_sec readings, then run part 2"

#!/bin/bash
# Round-17 bench campaign (round-16 verdict items 1/3/4/5/7):
#  - sf0.1 full sweeps (round record; now with pre-BUILD probes and the
#    sf1/sf10 control pins compiled in),
#  - an EARLY 100x boot while the box is fresh (item 7: the clean-boot
#    100x record — both r16 sf10 boots ran io 1.33/1.65),
#  - THREE 10x boots (item 3: the 3-boot sf1 merge with per-boot
#    control ratios over the new ControlSnapshotSf1),
#  - the same-boot ABAB serve cell r15-code vs HEAD on q157/q158/q159
#    (item 1) — the r15 worktree at 935d941 is built by prep below,
#  - the same-pair ABAB on q90-q95 at 10x (item 4: the postal lookaround
#    regex is the one code change on that path between 935d941 and HEAD),
#  - the q163/q166/q169 focused cells at sf0.1 and 100x (item 5: price
#    the policy leg against the manual schedule and the no-fold replay).
# Serial on purpose: each step owns the box. Launch with
# run_in_background bash, monitor via bench/r17_campaign.log.
set -e
cd /root/repo

step() { echo "=== $(date +%T) $1 ==="; }
rec() { grep -o '{"metric".*' "$1" | head -1 > "$2"; }

step "sf0.1 full sweep run1 (default order, n=3)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > bench/r17_sf01_run1.raw 2>&1
rec bench/r17_sf01_run1.raw bench/r17_sf01_run1.json

step "100x sweep run1 (EARLY for the clean-boot record - item 7)"
bash tools/run_sf10.sh 1 /root/repo/bench_sf10 r17_sf10

step "10x sweep run1"
bash tools/run_sf10.sh 1 /root/repo/bench_sf1 r17_sf1

step "ABAB serve cell: r15 code vs HEAD on q157/q158/q159 (item 1)"
for pass in 1 2; do
  ( cd /root/repo/.wt_r15 && \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_ONLY=q157_tagged_er_updates_served,q158_tagged_er_tombstones_served,q159_tagged_er_inserts_served \
    sbt -batch "runMain graft.Bench" \
      > /root/repo/bench/r17_serve_ab_r15_pass$pass.raw 2>&1 )
  rec bench/r17_serve_ab_r15_pass$pass.raw bench/r17_serve_ab_r15_pass$pass.json
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_ONLY=q157_tagged_er_updates_served,q158_tagged_er_tombstones_served,q159_tagged_er_inserts_served \
  sbt -batch "runMain graft.Bench" \
    > bench/r17_serve_ab_head_pass$pass.raw 2>&1
  rec bench/r17_serve_ab_head_pass$pass.raw bench/r17_serve_ab_head_pass$pass.json
done

step "ABAB postal cell: r15 code vs HEAD on q90-q95 at 10x (item 4)"
POSTAL=q90_tagged_ingest,q91_tagged_labels,q92_error_replay,q93_area_counts,q94_tagged_author_docs,q95_tagged_published_by
for pass in 1 2; do
  ( cd /root/repo/.wt_r15 && \
    SPARK_GRAFT_SF_DIR=/root/repo/bench_sf1 SPARK_GRAFT_ONLY="$POSTAL" \
    sbt -batch "runMain graft.Bench" \
      > /root/repo/bench/r17_postal_ab_r15_pass$pass.raw 2>&1 )
  rec bench/r17_postal_ab_r15_pass$pass.raw bench/r17_postal_ab_r15_pass$pass.json
  SPARK_GRAFT_SF_DIR=/root/repo/bench_sf1 SPARK_GRAFT_ONLY="$POSTAL" \
  sbt -batch "runMain graft.Bench" \
    > bench/r17_postal_ab_head_pass$pass.raw 2>&1
  rec bench/r17_postal_ab_head_pass$pass.raw bench/r17_postal_ab_head_pass$pass.json
done

step "q163/q166/q169 focused cell at sf0.1 (n=3) - item 5"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_ONLY=q163_er_crud_lifecycle_mor,q166_er_crud_lifecycle_mor_compact,q169_er_mor_compact_policy \
  sbt -batch "runMain graft.Bench" > bench/r17_sf01_compact_focused.raw 2>&1
rec bench/r17_sf01_compact_focused.raw bench/r17_sf01_compact_focused.json

step "sf0.1 full sweep run2"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > bench/r17_sf01_run2.raw 2>&1
rec bench/r17_sf01_run2.raw bench/r17_sf01_run2.json

step "10x sweep run2"
bash tools/run_sf10.sh 2 /root/repo/bench_sf1 r17_sf1

step "10x sweep run3"
bash tools/run_sf10.sh 3 /root/repo/bench_sf1 r17_sf1

step "100x sweep run2"
bash tools/run_sf10.sh 2 /root/repo/bench_sf10 r17_sf10

step "q163/q166/q169 focused cell at 100x (n=3) - item 5"
SPARK_GRAFT_SF_DIR=/root/repo/bench_sf10 \
  SPARK_GRAFT_ONLY=q163_er_crud_lifecycle_mor,q166_er_crud_lifecycle_mor_compact,q169_er_mor_compact_policy \
  sbt -batch "runMain graft.Bench" > bench/r17_sf10_compact_focused.raw 2>&1
rec bench/r17_sf10_compact_focused.raw bench/r17_sf10_compact_focused.json

step "sf0.1 full sweep run3"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > bench/r17_sf01_run3.raw 2>&1
rec bench/r17_sf01_run3.raw bench/r17_sf01_run3.json

step "emit merges (pinned + relative io adjudication)"
sbt -batch "runMain graft.BenchMerge bench/r17_sf01_merged.json bench/r17_sf01_run1.json bench/r17_sf01_run2.json bench/r17_sf01_run3.json" \
  > /dev/null 2>&1
sbt -batch "runMain graft.BenchMerge bench/r17_sf1_merged.json bench/r17_sf1_run1.json bench/r17_sf1_run2.json bench/r17_sf1_run3.json" \
  > /dev/null 2>&1
sbt -batch "runMain graft.BenchMerge bench/r17_sf10_merged.json bench/r17_sf10_run1.json bench/r17_sf10_run2.json" \
  > /dev/null 2>&1
sbt -batch "runMain graft.BenchMerge --relative-io bench/r17_sf01_merged_relio.json bench/r17_sf01_run1.json bench/r17_sf01_run2.json bench/r17_sf01_run3.json" \
  > /dev/null 2>&1

step "remove the r15 A/B worktree (keep the main tree clean for the driver's scans)"
git worktree remove --force /root/repo/.wt_r15 || true

step "CAMPAIGN DONE"

#!/bin/bash
# Round-18 bench campaign (round-17 verdict items 1/2/3/5 + the r18
# instrument changes):
#  - a FOCUSED q142 cell FIRST (item 5: q142's serve median is all-hot
#    two campaigns running because it sits late in the sweep; a focused
#    early-boot cell is the clean-probe observation),
#  - the same-boot ABAB cell r16-code (73e9d94) vs HEAD on
#    q151/q145/q143 at sf0.1 (item 1: the family doubled across all
#    three r17 boots including the clean-control one),
#  - the same-boot ABAB serve cell r15-code (935d941) vs HEAD on
#    q157/q158/q159 at 10x (item 3: the sf0.1 clearing does not carry
#    to sf1 on current evidence),
#  - THREE 100x boots (item 2: the r17 sf10 merge had n=2 and could not
#    reject the lone 406.7 s q162 observation) plus a focused q162 cell
#    with SPARK_GRAFT_METRICS=1 (spill/peak-memory evidence),
#  - full sweeps at sf0.1 and 10x (round record, n=3 boots each).
# Serial on purpose: each step owns the box. Launch with
# run_in_background bash, monitor via bench/r18_campaign.log.
set -e
cd /root/repo

step() { echo "=== $(date +%T) $1 ==="; }
rec() { grep -o '{"metric".*' "$1" | head -1 > "$2"; }

# --- prep: A/B worktrees, GUARDED (round-17 ADVICE 2: the r17 script
# documented a worktree "built by prep below" that nothing built; a
# clean-checkout rerun then aborted mid-campaign at the ABAB step).
# Idempotent: add if missing, then compile BOTH before any measured
# boot so no sbt compile runs mid-campaign.
step "prep: A/B worktrees (r16=73e9d94 for the q151 cell, r15=935d941 for the sf1 serve cell)"
git worktree add /root/repo/.wt_r16 73e9d94 2>/dev/null || true
git worktree add /root/repo/.wt_r15 935d941 2>/dev/null || true
test -d /root/repo/.wt_r16 || { echo "FATAL: .wt_r16 missing"; exit 1; }
test -d /root/repo/.wt_r15 || { echo "FATAL: .wt_r15 missing"; exit 1; }
( cd /root/repo/.wt_r16 && sbt -batch compile > /dev/null 2>&1 )
( cd /root/repo/.wt_r15 && sbt -batch compile > /dev/null 2>&1 )
sbt -batch compile > /dev/null 2>&1

step "focused q142 cell (item 5: the clean-probe serve observation, n=3)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_ONLY=q142_answer_served \
  sbt -batch "runMain graft.Bench" > bench/r18_q142_focused.raw 2>&1
rec bench/r18_q142_focused.raw bench/r18_q142_focused.json

step "ABAB q151-family cell: r16 code vs HEAD at sf0.1 (item 1)"
FAM=q151_er_updates,q145_exactly_once_fold,q143_er_incremental_served
for pass in 1 2; do
  ( cd /root/repo/.wt_r16 && \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY="$FAM" \
    sbt -batch "runMain graft.Bench" \
      > /root/repo/bench/r18_q151_ab_r16_pass$pass.raw 2>&1 )
  rec bench/r18_q151_ab_r16_pass$pass.raw bench/r18_q151_ab_r16_pass$pass.json
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY="$FAM" \
  sbt -batch "runMain graft.Bench" \
    > bench/r18_q151_ab_head_pass$pass.raw 2>&1
  rec bench/r18_q151_ab_head_pass$pass.raw bench/r18_q151_ab_head_pass$pass.json
done

step "ABAB serve cell at 10x: r15 code vs HEAD on q157/q158/q159 (item 3)"
SRV=q157_tagged_er_updates_served,q158_tagged_er_tombstones_served,q159_tagged_er_inserts_served
for pass in 1 2; do
  ( cd /root/repo/.wt_r15 && \
    SPARK_GRAFT_SF_DIR=/root/repo/bench_sf1 SPARK_GRAFT_ONLY="$SRV" \
    sbt -batch "runMain graft.Bench" \
      > /root/repo/bench/r18_serve_sf1_ab_r15_pass$pass.raw 2>&1 )
  rec bench/r18_serve_sf1_ab_r15_pass$pass.raw bench/r18_serve_sf1_ab_r15_pass$pass.json
  SPARK_GRAFT_SF_DIR=/root/repo/bench_sf1 SPARK_GRAFT_ONLY="$SRV" \
  sbt -batch "runMain graft.Bench" \
    > bench/r18_serve_sf1_ab_head_pass$pass.raw 2>&1
  rec bench/r18_serve_sf1_ab_head_pass$pass.raw bench/r18_serve_sf1_ab_head_pass$pass.json
done

step "100x sweep run1 (first of THREE boots - item 2)"
bash tools/run_sf10.sh 1 /root/repo/bench_sf10 r18_sf10

step "focused q162 cell at 100x with task metrics (item 2, n=3)"
SPARK_GRAFT_SF_DIR=/root/repo/bench_sf10 SPARK_GRAFT_METRICS=1 \
  SPARK_GRAFT_ONLY=q162_er_crud_lifecycle \
  sbt -batch "runMain graft.Bench" > bench/r18_q162_metrics.raw 2>&1
rec bench/r18_q162_metrics.raw bench/r18_q162_metrics.json

step "sf0.1 full sweep run1 (n=3)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > bench/r18_sf01_run1.raw 2>&1
rec bench/r18_sf01_run1.raw bench/r18_sf01_run1.json

step "10x sweep run1"
bash tools/run_sf10.sh 1 /root/repo/bench_sf1 r18_sf1

step "100x sweep run2"
bash tools/run_sf10.sh 2 /root/repo/bench_sf10 r18_sf10

step "sf0.1 full sweep run2"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > bench/r18_sf01_run2.raw 2>&1
rec bench/r18_sf01_run2.raw bench/r18_sf01_run2.json

step "10x sweep run2"
bash tools/run_sf10.sh 2 /root/repo/bench_sf1 r18_sf1

step "100x sweep run3 (the third boot the q162 adjudication needs)"
bash tools/run_sf10.sh 3 /root/repo/bench_sf10 r18_sf10

step "sf0.1 full sweep run3"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > bench/r18_sf01_run3.raw 2>&1
rec bench/r18_sf01_run3.raw bench/r18_sf01_run3.json

step "10x sweep run3"
bash tools/run_sf10.sh 3 /root/repo/bench_sf1 r18_sf1

step "emit merges (pinned + fully-relative)"
sbt -batch "runMain graft.BenchMerge bench/r18_sf01_merged.json bench/r18_sf01_run1.json bench/r18_sf01_run2.json bench/r18_sf01_run3.json" \
  > /dev/null 2>&1
sbt -batch "runMain graft.BenchMerge --relative bench/r18_sf01_merged_rel.json bench/r18_sf01_run1.json bench/r18_sf01_run2.json bench/r18_sf01_run3.json" \
  > /dev/null 2>&1
sbt -batch "runMain graft.BenchMerge bench/r18_sf1_merged.json bench/r18_sf1_run1.json bench/r18_sf1_run2.json bench/r18_sf1_run3.json" \
  > /dev/null 2>&1
sbt -batch "runMain graft.BenchMerge --relative bench/r18_sf1_merged_rel.json bench/r18_sf1_run1.json bench/r18_sf1_run2.json bench/r18_sf1_run3.json" \
  > /dev/null 2>&1
sbt -batch "runMain graft.BenchMerge bench/r18_sf10_merged.json bench/r18_sf10_run1.json bench/r18_sf10_run2.json bench/r18_sf10_run3.json" \
  > /dev/null 2>&1
sbt -batch "runMain graft.BenchMerge --relative bench/r18_sf10_merged_rel.json bench/r18_sf10_run1.json bench/r18_sf10_run2.json bench/r18_sf10_run3.json" \
  > /dev/null 2>&1

step "remove the A/B worktrees (keep the main tree clean for the driver's scans)"
git worktree remove --force /root/repo/.wt_r16 || true
git worktree remove --force /root/repo/.wt_r15 || true

step "CAMPAIGN DONE"

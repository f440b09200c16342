#!/bin/bash
# Back-to-back A/B of the r4 model tree vs HEAD at 21k-768, same session,
# same box — settles whether the 53.5 -> 47.9 delta is code or environment
# (r4's own profile implied 46.2 img/s while its bench row said 53.5).
# Restores the working tree afterwards. Writes /tmp/ab_21k768.log rows only;
# BENCH_FAMILY.json is restored from git at the end.
set -u
cd "$(dirname "$0")/.."
echo "=== A/B 21k-768 $(date) ==="

git stash list | head -1
cp BENCH_FAMILY.json /tmp/bench_family_backup.json
# a kill/timeout mid-run must not leave a mixed r4/HEAD tree — that would
# silently corrupt every later bench in this workspace
trap 'git checkout HEAD -- fastervit_tpu; cp /tmp/bench_family_backup.json BENCH_FAMILY.json' EXIT

echo "--- A: r4 tree (a090cf0) model+ops"
git checkout a090cf0 -- fastervit_tpu
python scripts/bench_family.py --models 21k_768 --out /tmp/bench_A_r4.json \
    2>&1 | grep -v "Platform 'axon'"

echo "--- B: HEAD tree"
git checkout HEAD -- fastervit_tpu
python scripts/bench_family.py --models 21k_768 --out /tmp/bench_B_head.json \
    2>&1 | grep -v "Platform 'axon'"

echo "--- A again (drift control)"
git checkout a090cf0 -- fastervit_tpu
python scripts/bench_family.py --models 21k_768 --out /tmp/bench_A2_r4.json \
    2>&1 | grep -v "Platform 'axon'"

git checkout HEAD -- fastervit_tpu
cp /tmp/bench_family_backup.json BENCH_FAMILY.json
echo "=== done $(date); A/B rows in /tmp/bench_{A_r4,B_head,A2_r4}.json ==="

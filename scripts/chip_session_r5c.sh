#!/bin/bash
# Round-5 chip session C: validate the MSDA bf16-upcast fix at the exact
# geometry that failed Mosaic compilation (frame_bf16_pallas and friends),
# then the headline bench for the round record.
# Usage: nohup bash scripts/chip_session_r5c.sh > /tmp/chip_r5c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo "=== chip session r5c $(date) ==="

run() {  # run <label> <cmd...> — sequential, never killed
  echo "--- $1 ($(date +%H:%M:%S))"; shift
  "$@" 2>&1 | grep -v "Platform 'axon' is experimental"
  local rc=${PIPESTATUS[0]}
  echo "--- rc=$rc ($(date +%H:%M:%S))"
  return $rc
}

run probe python -c "import jax; print(jax.devices())" || exit 1

# 1. the previously-uncompilable bf16 pallas streaming variants
run motr_bf16 python scripts/motr_speed_compare.py --variants \
    frame_bf16_pallas,frame_bf16_rowmix,frame_lite_encoder,frame_lite_bf16,frame_lite_bf16_pallas

# 2. definitive 21k re-bench after the probe-fallback fix (session B's
#    rows were depressed by a transient relay failure demoting tq)
run bench_21k python scripts/bench_family.py \
    --models 21k_224,21k_384,21k_512,21k_768

# 3. profile + MFU table re-derived from the definitive rows
run profile_cls python scripts/profile_cls.py
run roofline python scripts/roofline.py

# 4. headline bench for the round record (driver re-runs it too)
run bench python bench.py

echo "=== done $(date) ==="

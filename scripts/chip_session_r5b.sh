#!/bin/bash
# Round-5 chip session B: follow-ups that depend on session A's results or
# on code changed after A started (flash-kernel ctx-normalization).
# Usage: nohup bash scripts/chip_session_r5b.sh > /tmp/chip_r5b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo "=== chip session r5b $(date) ==="

run() {  # run <label> <cmd...> — sequential, never killed
  echo "--- $1 ($(date +%H:%M:%S))"; shift
  "$@" 2>&1 | grep -v "Platform 'axon' is experimental"
  local rc=${PIPESTATUS[0]}
  echo "--- rc=$rc ($(date +%H:%M:%S))"
  return $rc
}

run probe python -c "import jax; print(jax.devices())" || exit 1

# 0. online-softmax overlap experiment (decide-only: the shipped kernel is
#    what the bench legs below measure; adoption happens after this session)
run attn_online python scripts/attn_online_probe.py

# 1. train-step batch tuning probe (is b128 leaving MFU on the table?)
run train_tune python scripts/roofline_train.py \
    --configs faster_vit_0_224:256,faster_vit_3_224:128

# 2. MOTR drift bisect: the two defaults that flipped between r3 and r4
run motr_bisect python scripts/motr_speed_compare.py --bisect

# 2b. variants session A lost to a transient relay HTTP 500
run motr_rest python scripts/motr_speed_compare.py --variants \
    frame_bf16_pallas,frame_bf16_rowmix,frame_lite_encoder,frame_lite_bf16,frame_lite_bf16_pallas

# 3. re-bench the flash-kernel rows after the ctx-normalization + bf16-bias
#    changes (the 224 family uses the packed kernel — unaffected)
run bench_21k_flash python scripts/bench_family.py \
    --models 21k_384,21k_512,21k_768

# 4. refresh the 21k-768 stage profile against the new rows (the level_2
#    attention changed) and re-derive the MFU table from the same bench file
run profile_cls python scripts/profile_cls.py
run roofline env JAX_PLATFORMS=cpu python scripts/roofline.py

# 5. retry the int8 AOT probe (session A lost it to a transient relay
#    error at the very first compile)
run int8_aot python scripts/int8_aot_probe.py

echo "=== done $(date) ==="

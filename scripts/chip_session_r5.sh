#!/bin/bash
# Round-5 chip session: every pending on-chip measurement from VERDICT r4,
# one process at a time, each exiting cleanly (no external SIGTERM — a
# killed mid-compile client can wedge the relay; see ROUND_NOTES).
# Ordered by artifact value; a hung leg still leaves everything before it.
# Usage: nohup bash scripts/chip_session_r5.sh > /tmp/chip_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo "=== chip session r5 $(date) ==="

run() {  # run <label> <cmd...> — sequential, never killed
  echo "--- $1 ($(date +%H:%M:%S))"; shift
  "$@" 2>&1 | grep -v "Platform 'axon' is experimental"
  local rc=${PIPESTATUS[0]}
  echo "--- rc=$rc ($(date +%H:%M:%S))"
  return $rc
}

run probe python -c "import jax; print(jax.devices())" || exit 1

# 1. refresh PROFILE_CLS with the current defaults (VERDICT r4 weak #7:
#    bench_row_img_s was stale, norm_head was a negative residual row)
run profile_cls python scripts/profile_cls.py

# 2. train-step roofline (VERDICT r4 missing #3): fv0/fv3, remat on/off
run roofline_train python scripts/roofline_train.py --remat

# 3. detection headline: fused-auction batch sweep -> bench row
#    (VERDICT r4 missing #2)
run det_fused python scripts/profile_downstream.py --which dino --stages fused

# 4. 21k level_2 attention decomposition (VERDICT r4 next #5)
run attn_vpu python scripts/attn_vpu_probe.py

# 5. MOTR 1.53 -> 1.61 s/frame drift bisect (VERDICT r4 next #7)
run motr_bisect python scripts/motr_speed_compare.py

# 6. bake-mode deploy sweep over the 21k rows (VERDICT r4 next #9)
run baked_21k python scripts/bench_family.py --models 21k --baked

# 7. int8 family matrix close-out (VERDICT r4 next #6) — slowest compiles
#    last (XLA int8 lowering ~750 s/model)
run int8_family python scripts/bench_family.py --int8 \
    --models fv0,fv2,fv3,fv4,4_21k_224

# 8. is the int8 compile actually amortized by the deploy artifact?
run int8_aot python scripts/int8_aot_probe.py

echo "=== done $(date) ==="

#!/bin/bash
# One chip session: collect every pending on-chip measurement, one process
# at a time, each exiting cleanly (no external SIGTERM — a killed
# mid-compile client can wedge the relay for hours; see ROUND_NOTES).
# Usage: bash scripts/chip_session.sh >> /tmp/chip_session.log 2>&1
set -u
cd "$(dirname "$0")/.."
echo "=== chip session $(date) ==="

run() {  # run <label> <cmd...> — sequential, never killed
  echo "--- $1 ($(date +%H:%M:%S))"; shift
  "$@" 2>&1 | grep -v "Platform 'axon' is experimental"
  echo "--- rc=$? ($(date +%H:%M:%S))"
}

# 0. is the chip back?
run probe python -c "import jax; print(jax.devices())" || exit 1

# 1. headline bench (flagship)
run bench python bench.py

# 2. batch tuning for the sub-parity rows (fv5/fv6) + the 10.8%-MFU 768 row
run tune python scripts/bench_tune.py

# 3. DINO component profile + fused auction step (resumable stages)
run dino_prof python -u scripts/profile_downstream.py --which dino \
    --stages backbone,variants,grad,fused

# 4. MOTR component profile
run motr_prof python -u scripts/profile_downstream.py --which motr \
    --stages backbone,variants

# 5. MOTR streaming: lite-encoder + bf16 frame timing vs exact f32
run motr_speed python scripts/motr_speed_compare.py

echo "=== done $(date) ==="

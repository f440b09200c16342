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

# 1. fused-Pallas MSDA: production backend parity + speed at encoder scale
#    (ops/msda_pallas.py, VERDICT r2 #3)
run msda_e2e python scripts/msda_pallas_probe.py --e2e-only

# 2. MOTR streaming frame latency: exact/bf16/lite x xla/pallas backends
run motr_speed python scripts/motr_speed_compare.py

# 3. re-bench the 21k rows: BENCH_FAMILY predates the flash kernel's
#    bias-resident hqb grid order (FLASH_GRID_PROBE: 1.16-1.32x)
run bench_21k python scripts/bench_family.py --models 21k

# 4. headline bench (flagship, median±spread over 5 windows)
run bench python bench.py

# 5. regenerate the MFU table from the SAME bench rows (artifact
#    consistency — VERDICT r2 weak #2; runs on CPU, no chip needed)
run roofline env JAX_PLATFORMS=cpu python scripts/roofline.py

# 6. the north-star, auto-armed: if reference checkpoints / ImageNet ever
#    appear in-env, produce the real accuracy number per
#    docs/CONVERT_VALIDATE.md (Top-1 within 0.1% of README.md:134-277)
CKPT=$(ls /root/checkpoints/fastervit_*.pth.tar 2>/dev/null | head -1 || true)
IMNET=$(ls -d /root/data/imagenet/val /data/imagenet/val 2>/dev/null | head -1 || true)
if [ -n "$CKPT" ] && [ -n "$IMNET" ]; then
  run validate python -m fastervit_tpu.validate \
      --model "$(basename "$CKPT" .pth.tar)" --checkpoint "$CKPT" \
      --data-dir "$(dirname "$IMNET")" --batch-size 128 --dtype bfloat16
else
  echo "--- validate: skipped (no checkpoint/ImageNet in env; runbook" \
       "docs/CONVERT_VALIDATE.md stands ready)"
fi

echo "=== done $(date) ==="

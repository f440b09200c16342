"""Benchmark: flagship FasterViT-0 inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 5802 img/s — FasterViT-0 on A100 with TensorRT
(/root/reference/README.md:150, BASELINE.md).

Method mirrors the reference's validate.py throughput meter
(validate.py:286-344): warmup batch, then steady-state timing around
blocking dispatches. bf16 compute (the TPU analog of the TensorRT fp16
deployment path), fp32 params.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

MODEL = "faster_vit_0_224"
BASELINE_IMG_S = 5802.0  # A100 TensorRT, reference README.md:150
BATCH = 256
ITERS = 30
WINDOWS = 6  # measured timing windows; first discarded (relay first-run cost)


def main():
    import fastervit_tpu as fvt

    model = fvt.create_model(MODEL, dtype=jnp.bfloat16)
    variables = jax.jit(model.module.init)(jax.random.PRNGKey(0),
                                           jnp.zeros((1, 224, 224, 3)))

    # each iteration's input depends on the previous output so async dispatch
    # through the device relay cannot overlap/elide steps
    @jax.jit
    def fwd_chained(v, x, s):
        out = model.module.apply(v, x)
        return out, s + out[0, 0].astype(jnp.float32)

    x = jnp.asarray(np.random.RandomState(0).randn(BATCH, 224, 224, 3),
                    jnp.bfloat16)
    s = jnp.zeros((), jnp.float32)
    out, s = fwd_chained(variables, x, s)      # compile
    float(s)                                    # host fetch = true barrier
    out, s = fwd_chained(variables, x, s)      # warmup
    float(s)

    # NOTE: through the axon relay, block_until_ready can return before the
    # device has executed; a host fetch of a result-dependent scalar is the
    # only reliable barrier, and the iteration chain (s feeds back in)
    # serializes execution. Median over WINDOWS-1 windows (first measured
    # window discarded: the relay's first-executable run pays per-call
    # setup) defends against the relay's ±4% run-to-run variance; min/max
    # spread is reported so round-over-round drift is attributable.
    rates = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out, s = fwd_chained(variables, x, s)
        float(s)
        rates.append(BATCH * ITERS / (time.perf_counter() - t0))
    kept = sorted(rates[1:])
    img_s = float(np.median(kept))

    # round-over-round regression tracking (VERDICT r3 #4): compare against
    # the newest committed BENCH_r0N.json so drift is visible in the
    # artifact itself instead of requiring a manual diff across rounds
    prev_value = prev_round = None
    repo = os.path.dirname(os.path.abspath(__file__))
    for name in sorted(n for n in os.listdir(repo)
                       if n.startswith("BENCH_r") and n.endswith(".json")):
        try:
            with open(os.path.join(repo, name)) as f:
                parsed = json.load(f).get("parsed", {})
            if "value" in parsed:
                prev_value, prev_round = parsed["value"], name
        except Exception:
            pass

    print(json.dumps({
        "metric": f"{MODEL} inference images/sec/chip (bf16, 224px, batch {BATCH})",
        "value": round(img_s, 1),
        "unit": "img/s",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 3),
        "spread_min": round(kept[0], 1),
        "spread_max": round(kept[-1], 1),
        "windows": len(kept),
        "iters_per_window": ITERS,
        "batch": BATCH,
        "dtype": "bfloat16",
        "method": "chained-scalar-fetch barrier; first window discarded",
        "vs_prev_round": (round(img_s / prev_value, 3)
                          if prev_value else None),
        "prev_round_src": prev_round,
    }))


if __name__ == "__main__":
    main()

"""Train-step roofline (VERDICT r3 #7): measured train throughput x
XLA-cost-model FLOPs -> MFU, for the full production train step
(mixup + bf16 fwd/bwd + clip + adamw + EMA), per variant.

Inference rows live in ROOFLINE.json (scripts/roofline.py); this writes
ROOFLINE_TRAIN.json with the same schema plus step FLOPs from the cost
analysis of the jitted step itself (so the remat policy's recompute FLOPs
are counted as the chip actually executes them).

Variants: --configs fv0:128,fv3:64 [--remat] (compare remat on/off).

Usage: python scripts/roofline_train.py
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_TFLOPS = 197.0


def bench_train(name: str, batch: int, remat: bool, iters=10, windows=4):
    import fastervit_tpu as fvt
    from fastervit_tpu.train.steps import (TrainConfig, create_optimizer,
                                           create_train_state,
                                           make_train_step)

    model = fvt.create_model(name, dtype=jnp.bfloat16)
    cfg = TrainConfig(grad_checkpoint=remat)
    tx = create_optimizer(lambda step: 5e-4, cfg)
    state = create_train_state(model, tx, rng=jax.random.PRNGKey(0), cfg=cfg)
    step_fn = jax.jit(make_train_step(model.module, tx, cfg))
    res = model.cfg.resolution
    res = res if isinstance(res, int) else res[0]
    rs = np.random.RandomState(0)
    batch_data = {
        "image": jnp.asarray(rs.randn(batch, res, res, 3), jnp.bfloat16),
        "label": jnp.asarray(rs.randint(0, 1000, (batch,)), jnp.int32)}
    rng = jax.random.PRNGKey(1)

    # single compile: lower/compile once, read the cost analysis off the
    # same executable that gets timed (the re-lower in the first version
    # of this script would have doubled the ~10-min fv0 train compile)
    t0 = time.time()
    compiled = step_fn.lower(state, batch_data, rng).compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception as e:
        print(f"  cost analysis failed: {e}", flush=True)
        flops = 0.0
    state, metrics = compiled(state, batch_data, rng)
    float(metrics["loss"])
    compile_s = time.time() - t0
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = compiled(state, batch_data, rng)
        float(metrics["loss"])
        times.append((time.perf_counter() - t0) / iters)
    kept = sorted(times[1:])
    step_s = float(np.median(kept))
    return step_s, compile_s, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="faster_vit_0_224:128,"
                                         "faster_vit_3_224:64")
    ap.add_argument("--remat", action="store_true",
                    help="also measure the grad-checkpointed step")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "ROOFLINE_TRAIN.json"))
    args = ap.parse_args()
    rows = []
    if os.path.exists(args.out):
        rows = json.load(open(args.out))
    for spec in args.configs.split(","):
        name, b = spec.split(":")
        b = int(b)
        for remat in ([False, True] if args.remat else [False]):
            key = f"{name}{'+remat' if remat else ''}"
            try:
                step_s, compile_s, flops = bench_train(
                    name, b, remat, iters=args.iters)
            except Exception as e:
                print(f"{key}: FAIL {type(e).__name__}: {e}"[:300],
                      flush=True)
                continue
            img_s = b / step_s
            tfs = flops / step_s / 1e12
            row = {"model": name, "mode": "train", "remat": remat,
                   "batch": b, "dtype": "bfloat16",
                   "step_ms": round(step_s * 1e3, 1),
                   "img_s": round(img_s, 1),
                   "step_gflops": round(flops / 1e9, 1),
                   "achieved_tflops": round(tfs, 1),
                   "mfu_pct": round(100 * tfs / V5E_PEAK_TFLOPS, 1),
                   "compile_s": round(compile_s, 1),
                   "method": "full train step (mixup+bf16 fwd/bwd+clip5.0+"
                             "adamw+EMA), chained-fetch medians; FLOPs from "
                             "XLA cost analysis of the same jitted step"}
            rows = [r for r in rows
                    if not (r["model"] == name and r.get("remat") == remat
                            and r.get("batch") == b)]
            rows.append(row)
            print(f"{key:28s} b{b} {step_s * 1e3:8.1f} ms "
                  f"{img_s:8.1f} img/s {tfs:6.1f} TF/s "
                  f"{row['mfu_pct']:5.1f}% MFU", flush=True)
            with open(args.out, "w") as f:
                json.dump(rows, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

"""Roofline/MFU table: analytic FLOPs per image (XLA cost analysis on CPU)
x measured throughput (BENCH_FAMILY.json) vs the v5e bf16 peak.

Context for the family bench: shows which variants run near the chip's
matmul ceiling and which have headroom. The reference README publishes
FLOPs for every variant (README.md:140-277) — the XLA count is
cross-checked against those rows where available.

Runs entirely on CPU (forces jax_platforms=cpu before first backend use).

Usage: python scripts/roofline.py [--out ROOFLINE.json]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

# v5e: 197 TFLOP/s bf16 peak (one chip). Narrow-K convs cap lower
# (~43 TF at FasterViT stem shapes — see ROUND_NOTES perf findings).
V5E_PEAK_TFLOPS = 197.0

# reference-published GFLOPs (README.md:140-277), for cross-check
REF_GFLOPS = {
    "faster_vit_0_224": 3.3, "faster_vit_1_224": 5.3,
    "faster_vit_2_224": 8.7, "faster_vit_3_224": 18.2,
    "faster_vit_4_224": 36.6, "faster_vit_5_224": 113.0,
    "faster_vit_6_224": 142.0, "faster_vit_4_21k_224": 40.8,
    "faster_vit_4_21k_384": 120.1, "faster_vit_4_21k_512": 213.5,
    "faster_vit_4_21k_768": 480.4,
}


def model_flops(name: str, res: int) -> float:
    """Analytic forward FLOPs for one image via XLA's cost model."""
    import fastervit_tpu as fvt
    m = fvt.create_model(name)
    v = jax.eval_shape(lambda: None)  # noqa: F841 (keep jax warm-up tiny)
    variables = m.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, res, res, 3), jnp.float32)
    lowered = jax.jit(lambda v, x: m.module.apply(v, x)).lower(variables, x)
    cost = lowered.compile().cost_analysis()
    return float(cost.get("flops", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default="BENCH_FAMILY.json")
    ap.add_argument("--out", default="ROOFLINE.json")
    args = ap.parse_args()
    bench = {r["model"]: r for r in json.load(open(args.bench))}
    rows = []
    print(f"{'model':24s} {'GF/img':>8s} {'ref':>7s} {'img/s':>8s} "
          f"{'TF/s':>7s} {'MFU%':>6s}")
    import fastervit_tpu as fvt
    for name, b in bench.items():
        # skip non-classification rows (e.g. the detection train-step row)
        if "img_s" not in b or not fvt.is_model(name):
            continue
        gf = model_flops(name, b["res"]) / 1e9
        tfs = gf * b["img_s"] / 1e3
        mfu = 100.0 * tfs / V5E_PEAK_TFLOPS
        ref = REF_GFLOPS.get(name)
        row = {"model": name, "res": b["res"], "gflops_img": round(gf, 1),
               "ref_gflops": ref, "img_s": b["img_s"],
               "achieved_tflops": round(tfs, 1), "mfu_pct": round(mfu, 1)}
        # provenance: carry the bench row's spread so this table is
        # verifiably derived from the same runs as BENCH_FAMILY.json
        for k in ("spread_min", "spread_max", "dtype", "batch"):
            if k in b:
                row[k] = b[k]
        rows.append(row)
        print(f"{name:24s} {gf:8.1f} {ref if ref else 0:7.1f} "
              f"{b['img_s']:8.1f} {tfs:7.1f} {mfu:6.1f}", flush=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
